"""GUI-layer tools: SVG reader, environment editor, NURBS/tensor splines,
rotating-obstacle machinery (all headless)."""

import numpy as np
import pytest

from omg_tools_tpu import (EnvironmentGUI, SVGReader, Obstacle, Rectangle,
                           Circle, Nurbs, TensorBSpline)
from omg_tools_tpu.ops.basis import clamped_basis
from omg_tools_tpu.ops.spline import (BSpline, circle_arc_splines,
                                      sample_spline)

pytestmark = pytest.mark.fast

SVG = """<?xml version="1.0"?>
<svg xmlns="http://www.w3.org/2000/svg" width="100" height="80">
  <rect x="10" y="10" width="20" height="10"/>
  <circle cx="60" cy="40" r="5"/>
  <line x1="0" y1="0" x2="50" y2="40"/>
  <path d="M 70 60 L 90 60 L 90 70 L 70 70 Z"/>
</svg>
"""


def test_svg_reader_shapes(tmp_path):
    f = tmp_path / "env.svg"
    f.write_text(SVG)
    reader = SVGReader()
    reader.init(str(f))
    reader.set_world_size(10.0, 8.0)
    desc = reader.build_environment()
    assert desc["width"] == pytest.approx(10.0)
    shapes = sorted(o["shape"] for o in desc["obstacles"])
    assert shapes == ["circle", "rectangle", "rectangle"]
    circ = [o for o in desc["obstacles"] if o["shape"] == "circle"][0]
    # pixel (60,40), r=5 -> world (6.0, (80-40)/10=4.0), r=0.5
    assert circ["pos"] == pytest.approx([6.0, 4.0])
    assert circ["radius"] == pytest.approx(0.5)
    # the path rectangle: bbox 70..90 x 60..70 px
    rects = [o for o in desc["obstacles"] if o["shape"] == "rectangle"]
    path_rect = max(rects, key=lambda o: o["pos"][0])
    assert path_rect["width"] == pytest.approx(2.0)
    assert path_rect["height"] == pytest.approx(1.0)


def test_svg_reader_lines(tmp_path):
    f = tmp_path / "lines.svg"
    f.write_text(SVG)
    reader = SVGReader()
    reader.init(str(f))
    lines = reader.convert_lines()
    assert ([0.0, 0.0], [50.0, 40.0]) in [tuple(map(list, l)) for l in lines]


def test_environment_gui_headless(tmp_path):
    gui = EnvironmentGUI(width=8.0, height=8.0, display=False,
                         options={"cell_size": 0.5})
    obs = gui.on_click(gui.world_to_pixel([1.26, -2.24]), "circle",
                       radius=0.4)
    assert obs["pos"] == pytest.approx([1.5, -2.0])  # snapped to 0.5 grid
    gui2 = EnvironmentGUI(width=8.0, height=8.0, display=False)
    fname = tmp_path / "env.pickle"
    gui.add_obstacle({"shape": "rectangle", "pos": [0.0, 0.0],
                      "width": 1.0, "height": 0.5})
    gui.save_environment(str(fname))
    gui2.load_environment(str(fname))
    assert len(gui2.obstacles) == 2
    env = gui2.build_environment()
    assert len(env.obstacles) == 2
    assert env.n_dim == 2


def test_gui_pixel_world_roundtrip():
    gui = EnvironmentGUI(width=6.0, height=4.0, position=[1.0, -1.0],
                         display=False)
    for world in ([0.0, 0.0], [1.5, -2.0], [-1.2, 0.7]):
        back = gui.pixel_to_world(gui.world_to_pixel(world))
        assert back == pytest.approx(world)


def test_nurbs_division_and_eval():
    basis = clamped_basis(4, 3)
    num = BSpline(basis, np.linspace(1.0, 2.0, len(basis)))
    den = BSpline(basis, np.linspace(2.0, 3.0, len(basis)))
    rat = num / den
    assert isinstance(rat, Nurbs)
    x = np.linspace(0, 1, 50)
    got = np.asarray(rat.numerator()(x)) / np.asarray(rat.denominator()(x))
    want = np.asarray(num(x)) / np.asarray(den(x))
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_tensor_bspline_eval_and_product():
    bu, bv = clamped_basis(3, 2), clamped_basis(4, 3)
    rng = np.random.default_rng(3)
    C1 = rng.normal(size=(len(bu), len(bv)))
    C2 = rng.normal(size=(len(bu), len(bv)))
    s1 = TensorBSpline([bu, bv], C1)
    s2 = TensorBSpline([bu, bv], C2)
    u, v = np.linspace(0, 1, 7), np.linspace(0, 1, 9)
    e1 = np.asarray(s1(u, v))
    want = np.einsum("ui,vj,ij->uv", bu.eval(u), bv.eval(v), C1)
    np.testing.assert_allclose(e1, want, atol=1e-10)
    prod = s1 * s2
    np.testing.assert_allclose(np.asarray(prod(u, v)), e1 * np.asarray(s2(u, v)),
                               atol=1e-9)
    summ = s1 + s2
    np.testing.assert_allclose(np.asarray(summ(u, v)),
                               e1 + np.asarray(s2(u, v)), atol=1e-10)
    ui = np.linspace(0.1, 0.9, 7)  # interior: FD probes must stay in [0,1]
    du = s1.derivative(1, 0)
    eps = 1e-6
    fd = (np.asarray(s1(ui + eps, v)) - np.asarray(s1(ui - eps, v))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(du(ui, v)), fd, atol=1e-4)


def test_circle_arc_exact_on_circle():
    for sweep in (0.7, np.pi, 5.5, 2 * np.pi):
        cn, sn, w = circle_arc_splines(sweep)
        u = np.linspace(0, 1, 101)
        c = sample_spline(cn, u) / sample_spline(w, u)
        s = sample_spline(sn, u) / sample_spline(w, u)
        np.testing.assert_allclose(c ** 2 + s ** 2, 1.0, atol=1e-12)
        # quarter-boundary points hit the true angle exactly
        ks = np.arange(int(sweep / (np.pi / 2)) + 1)
        uq = ks * (np.pi / 2) / sweep
        uq = uq[uq <= 1 + 1e-12]
        cq = sample_spline(cn, uq) / sample_spline(w, uq)
        np.testing.assert_allclose(cq, np.cos(sweep * uq), atol=1e-12)


def test_rotating_obstacle_simulation():
    obs = Obstacle({"position": [0.0, 0.0], "angular_velocity": 0.5},
                   shape=Rectangle(width=2.0, height=0.4))
    obs.simulate(1.0, 0.1)
    assert obs.signals["orientation"][0, -1] == pytest.approx(0.5)
    s0, _ = obs.draw(t=0)
    s1, _ = obs.draw(t=-1)
    # outline rotated: vertices moved
    assert not np.allclose(s0[0], s1[0])


def test_svg_maze_pipeline():
    """The SVG maze asset parses into the expected wall geometry and the
    resulting Environment supports global planning from start to goal --
    the SVG -> EnvironmentGUI -> Environment -> planner content pipeline
    (reference gui/svg_reader.py:6-340 driven from
    examples/gui_examples/svg/)."""
    import os
    svg = os.path.join(os.path.dirname(__file__), "..", "examples",
                       "gui_examples", "svg", "maze_gen.svg")
    gui = EnvironmentGUI(display=False)
    gui.load_svg(svg, world_width=20.0)
    # four path walls + two circles, world scale 20 m / 1000 px
    walls = [o for o in gui.obstacles if o["shape"] == "rectangle"]
    discs = [o for o in gui.obstacles if o["shape"] == "circle"]
    assert len(walls) == 4 and len(discs) == 2
    w0 = min(walls, key=lambda o: o["pos"][0])
    assert w0["width"] == pytest.approx(0.6)      # 30 px * 0.02
    assert w0["height"] == pytest.approx(9.0)     # 450 px * 0.02
    assert w0["pos"][0] == pytest.approx(4.0)     # (185+215)/2 px * 0.02
    assert discs[0]["radius"] == pytest.approx(0.6)
    env = gui.get_environment()
    assert len(env.obstacles) == 6
    # the serpentine corridor is navigable end to end
    from omg_tools_tpu.problems.globalplanner import AStarPlanner
    planner = AStarPlanner(env, [40, 24], [1.0, 1.0], [19.0, 11.0],
                           vehicle_size=0.5)
    path = planner.get_path()
    assert path is not None and len(path) > 10
    ends = np.asarray(path[-1][:2], dtype=float)
    assert np.linalg.norm(ends - np.array([19.0, 11.0])) < 1.5

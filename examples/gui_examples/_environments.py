"""Programmatic builders for the vast-environment GUI scenarios.

The reference ships click-built pickled environments
(reference examples/gui_examples/vast_environment_example{1,2,_maze}.pickle)
that are loaded into the GUI and fed to a SchedulerProblem.  Here the same
three scenario archetypes are rebuilt programmatically through the repo's
own EnvironmentGUI data model and saved via its pickle path, so the
examples exercise the identical load-pickle -> build_environment ->
scheduler pipeline headlessly.

Scenario archetypes (matched to the reference's, not copied):
- example1: open 16x16 hall with scattered block/disc clutter
- example2: 16x16 hall cut by long walls with door gaps (corridor hopping)
- maze:     30x30 serpentine wall maze, the scheduler stress test
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..', '..'))

from omg_tools_tpu import EnvironmentGUI  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


def _rect(pos, w, h):
    return {"shape": "rectangle", "pos": list(pos), "width": float(w),
            "height": float(h), "velocity": [0.0, 0.0], "bounce": False}


def _circ(pos, r):
    return {"shape": "circle", "pos": list(pos), "radius": float(r),
            "velocity": [0.0, 0.0], "bounce": False}


def example1_gui():
    """Scattered clutter in a 16x16 hall."""
    gui = EnvironmentGUI(width=16.0, height=16.0, position=[0.0, 0.0],
                         options={"cell_size": 0.5}, display=False)
    for obs in [
            _rect([-4.0, -4.0], 2.0, 2.0),
            _rect([0.0, -2.0], 1.0, 4.0),
            _rect([4.0, 0.0], 3.0, 1.0),
            _rect([-2.0, 3.0], 4.0, 1.0),
            _circ([2.5, 4.5], 1.0),
            _circ([-5.0, 1.5], 0.8),
            _rect([5.5, -4.5], 1.5, 1.5)]:
        gui.add_obstacle(obs)
    gui.clicked_positions = [[-6.5, -6.5], [6.5, 6.5]]
    return gui


def example2_gui():
    """Two long walls with offset door gaps: forced corridor hopping."""
    gui = EnvironmentGUI(width=16.0, height=16.0, position=[0.0, 0.0],
                         options={"cell_size": 0.5}, display=False)
    # wall 1 at y = -2.5, door on the right
    for obs in [
            _rect([-3.0, -2.5], 10.0, 0.5),
            _rect([7.0, -2.5], 2.0, 0.5),
            # wall 2 at y = +2.5, door on the left
            _rect([3.0, 2.5], 10.0, 0.5),
            _rect([-7.0, 2.5], 2.0, 0.5),
            # clutter inside the middle corridor
            _circ([0.0, 0.0], 0.7)]:
        gui.add_obstacle(obs)
    gui.clicked_positions = [[-6.5, -6.5], [6.5, 6.5]]
    return gui


def maze_gui(scale=1.0, n_walls=5):
    """Serpentine maze: ``n_walls`` alternating walls across a square hall
    (30x30 at scale 1).

    ``scale`` shrinks the whole maze (tests use scale<1 and fewer walls
    for shorter runs)."""
    s = float(scale)
    gui = EnvironmentGUI(width=30.0 * s, height=30.0 * s,
                         position=[0.0, 0.0],
                         options={"cell_size": 0.5 * s}, display=False)
    w = 30.0 * s          # hall width
    t = 0.6 * s           # wall thickness
    gap = 6.0 * s         # passage width at the open end
    wall_len = w - gap    # each wall leaves one gap
    ys = np.linspace(-w / 2, w / 2, n_walls + 2)[1:-1]   # wall heights
    for k, y in enumerate(ys):
        if k % 2 == 0:
            # open on the right: wall hugs the left side
            cx = -w / 2 + wall_len / 2
        else:
            cx = w / 2 - wall_len / 2
        gui.add_obstacle(_rect([cx, float(y)], wall_len, t))
    m = 2.0 * s
    gui.clicked_positions = [[-w / 2 + m, -w / 2 + m],
                             [w / 2 - m, w / 2 - m]]
    return gui


BUILDERS = {"vast_environment_example1": example1_gui,
            "vast_environment_example2": example2_gui,
            "vast_environment_example_maze": maze_gui}


def load_or_create(name):
    """Return an EnvironmentGUI for ``name``, creating + pickling the
    environment on first use (the GUI's save/load path is the persistence
    mechanism the reference's click-built pickles exercise)."""
    path = os.path.join(HERE, name + ".pickle")
    gui = EnvironmentGUI(display=False)
    if os.path.exists(path):
        gui.load_environment(path)
        built = BUILDERS[name]()
        gui.clicked_positions = built.clicked_positions
        gui.options.update(built.options)
    else:
        gui = BUILDERS[name]()
        gui.save_environment(path)
    return gui

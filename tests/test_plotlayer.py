"""PlotLayer provider/export tests (headless).

The reference exposes plots through provider hooks on every entity
(reference plotlayer.py:201-273); these tests exercise the same surface
without running a solver: trajectories are injected via vehicle.store.
"""

import os

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg")

from omg_tools_tpu import (Holonomic, Environment, Obstacle, Circle, Square,
                           Point2point)

pytestmark = pytest.mark.fast


@pytest.fixture()
def scene(tmp_path):
    veh = Holonomic()
    veh.set_initial_conditions([-1.5, -1.5])
    veh.set_terminal_conditions([2.0, 2.0])
    env = Environment(room={"shape": Square(5.0)})
    env.add_obstacle(Obstacle({"position": [1.5, 0.5], "velocity": [-0.2, 0]},
                              shape=Circle(0.4)))
    prob = Point2point(veh, env, freeT=False)
    n = len(veh.basis)
    coeffs = np.stack([np.linspace(-1.5, 2.0, n),
                       np.linspace(-1.5, 2.0, n)], axis=1)
    veh.store(0.0, 0.01, [coeffs], 10.0)
    veh.simulate(0.5, 0.01)
    env.simulate(0.5, 0.01)
    veh.store(0.5, 0.01, [coeffs], 10.0)
    return veh, env, prob, tmp_path


def test_vehicle_signal_plot(scene):
    veh, _, _, _ = scene
    plot = veh.plot("state", knots=True, prediction=True)
    assert len(plot["axes"]) == 2          # one row per state dim
    veh.update_plots(t=30)
    (ln_hist, ln_traj, ln_knots, ln_pred) = plot["lines"][0][0]
    assert ln_hist.get_xdata().shape[0] == 31
    assert ln_traj.get_xdata().shape[0] > 0
    assert ln_knots.get_xdata().shape[0] == 9   # interior knots of 10 intervals


def test_traj_storage_lookup(scene):
    veh, _, _, _ = scene
    assert len(veh.traj_storage) == 2
    # sample index 30 -> t = 0.3 s -> trajectory solved at t=0
    assert veh._traj_at(30) is veh.traj_storage[0]
    assert veh._traj_at(-1) is veh.traj_storage[-1]


def test_scene_plot_and_exports(scene):
    veh, env, prob, tmp_path = scene
    plot = prob.plot("scene")
    n_lines = len(plot["lines"][0][0])
    prob.update_plots(t=40)
    assert len(plot["lines"][0][0]) == n_lines  # static line count
    png = prob.save_plot("scene", name="s.png", path=str(tmp_path) + "/")
    assert os.path.getsize(png) > 0
    tex = prob.save_plot("scene", name="s.tex", path=str(tmp_path) + "/")
    content = open(tex).read()
    assert "tikzpicture" in content and "addplot" in content
    gif = prob.save_movie("scene", format="gif", name="m",
                          path=str(tmp_path) + "/", number_of_frames=3)
    assert gif.endswith(".gif") and os.path.getsize(gif) > 0


def test_unknown_provider_raises(scene):
    veh, _, _, _ = scene
    with pytest.raises(ValueError):
        veh.plot("nonexistent_signal")

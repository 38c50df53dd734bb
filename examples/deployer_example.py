"""Deployer in a motion-planning application: drive through via points
while an obstacle is repositioned between legs; the deployer owns the
update loop, the plant is ideal trajectory following (reference
examples/deployer_example.py)."""
import os, sys
import numpy as np
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))  # repo-root import
from omg_tools_tpu import (Holonomic, Environment, Obstacle, Circle, Square,
                           Point2point, Deployer)

SMOKE = bool(os.environ.get("OMG_SMOKE"))

vehicle = Holonomic()
vehicle.set_options({"safety_distance": 0.1, "ideal_prediction": False})
vehicle.set_initial_conditions([0.0, 0.0])   # dummy, replaced per leg
vehicle.set_terminal_conditions([0.0, 0.0])
environment = Environment(room={"shape": Square(5.0)})
obstacle = Obstacle({"position": [0.0, 0.0]}, shape=Circle(0.2))
environment.add_obstacle(obstacle)
problem = Point2point(vehicle, environment, freeT=False)
problem.set_options({"verbose": 0})
problem.init()

update_time, sample_time = 0.1, 0.01
deployer = Deployer(problem, sample_time, update_time)
# live dashboards: per-axis state/input panels + scene, refreshed per
# update (reference deployer.py:241-357); headless under Agg
deployer.init_dashboard()
n_samp = int(round(update_time / sample_time))

via_points = [[2.0, -1.5], [2.0, 2.0], [-1.5, 2.0]]
obstacle_positions = [[0.0, 0.0], [1.5, 0.0], [1.0, 2.0]]

current_state = np.array([-1.5, -1.5])
state_traj = np.c_[current_state]
input_traj = np.c_[[0.0, 0.0]]
current_time = 0.0

for leg, (via_point, obstacle_pos) in enumerate(
        zip(via_points, obstacle_positions)):
    vehicle.set_terminal_conditions(via_point)
    obstacle.set_state({"position": obstacle_pos})
    vehicle.set_initial_conditions(current_state.tolist())
    deployer.reset()   # fresh initial guess for the new leg
    steps = 0
    while True:
        current_state = state_traj[:, -1]
        trajectories = deployer.update(current_time, current_state)
        traj = trajectories[vehicle]
        state_traj = np.c_[state_traj, traj["state"][:2, 1:n_samp + 1]]
        input_traj = np.c_[input_traj, traj["input"][:, 1:n_samp + 1]]
        current_time += update_time
        steps += 1
        if (np.linalg.norm(np.asarray(via_point) - state_traj[:, -1]) < 1e-2
                and np.linalg.norm(input_traj[:, -1]) < 1e-2):
            break
        if steps > (2 if SMOKE else 300):
            break
    print(f"deployer: leg {leg} -> {state_traj[:, -1]} in {steps} updates")
    if SMOKE and leg == 0:
        break

if not SMOKE:
    err = np.linalg.norm(np.asarray(via_points[-1]) - state_traj[:, -1])
    assert err < 5e-2, f"last via point missed by {err:.3f}"
print("deployer: trajectory samples", state_traj.shape[1])

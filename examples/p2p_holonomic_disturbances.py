"""Input disturbance + first-order input delay on the simulated plant
(reference examples/p2p_holonomic_disturbances.py, vehicle.py:433-450)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))  # repo-root import
from omg_tools_tpu import (Holonomic, Environment, Obstacle, Circle, Square,
                           Point2point, Simulator)
from _smoke import run

vehicle = Holonomic(options={
    "input_disturbance": {"fc": 0.01, "stdev": [0.05, 0.05]},
    "1storder_delay": True, "time_constant": 0.1})
vehicle.set_initial_conditions([-1.5, -1.5])
vehicle.set_terminal_conditions([2.0, 2.0])
environment = Environment(room={"shape": Square(5.0)})
environment.add_obstacle(Obstacle({"position": [0.5, 0.2]},
                                  shape=Circle(0.3)))
problem = Point2point(vehicle, environment, freeT=False)
problem.set_options({"verbose": 0})
problem.init()
run(problem, Simulator(problem), n_smoke_steps=3)
print("p2p_holonomic_disturbances: final",
      vehicle.signals["pose"][:2, -1])

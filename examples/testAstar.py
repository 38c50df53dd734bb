"""Grid A* on a room with a blocking obstacle: plan, draw the occupancy
grid, and print the waypoints (reference examples/testAstar.py)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))
import numpy as np
from omg_tools_tpu import Environment, Obstacle, Rectangle, AStarPlanner

start = [2.0, 2.0]
goal = [8.0, 8.0]
environment = Environment(room={"shape": Rectangle(width=10.0, height=10.0),
                                "position": [5.0, 5.0]})
environment.add_obstacle(Obstacle({"position": [5.0, 5.0]},
                                  shape=Rectangle(width=2.0, height=2.0)))
planner = AStarPlanner(environment, [10, 10], start, goal)
waypoints = planner.get_path(start, goal)
print("waypoints:", np.round(np.asarray(waypoints), 2).tolist())
assert waypoints is not None and len(waypoints) >= 2
wp = np.asarray(waypoints)
assert np.linalg.norm(wp[-1] - np.asarray(goal)) < 1.0
# the path must not cross the inflated central block
for p in wp:
    assert not (abs(p[0] - 5.0) < 1.0 and abs(p[1] - 5.0) < 1.0), p

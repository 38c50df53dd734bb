"""Race-track part program: long straights + 180-degree ring segments + a
chicane; the large arcs exercise ring splitting and window rolling
(reference examples/GCode_examples/gcodeproblem_racetrack.py)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))  # repo-root import
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))
from omg_tools_tpu import Tool, GCodeReader, GCodeSchedulerProblem, Simulator
from _smoke import run

reader = GCodeReader()
reader.load_file(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "racetrack.nc"))
blocks = reader.parse()
tool = Tool(tolerance=0.5)
tool.define_knots(knot_intervals=5)
tool.set_initial_conditions(blocks[0].start)
# the long 180-degree arcs stress split_ring_segments: each ring is cut so
# the tolerance tube cannot short-cut the bend (reference
# gcodeschedulerproblem.py split_ring_segment :506)
problem = GCodeSchedulerProblem(tool, blocks, n_segments=2)
problem.set_options({"verbose": 0})
problem.init()
run(problem, Simulator(problem, sample_time=0.002, update_time=0.02))
print("gcode racetrack: final", tool.signals["pose"][:3, -1],
      "blocks:", len(blocks))

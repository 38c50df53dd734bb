"""Machine a rounded slot: linear moves joined by G02/G03 arcs -- ring
segments are split and followed inside ring-sector tolerance rooms
(reference examples/GCode_examples/gcodeproblem_rsq5.py)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))  # repo-root import
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))
from omg_tools_tpu import Tool, GCodeReader, GCodeSchedulerProblem, Simulator
from _smoke import run

reader = GCodeReader()
reader.load_file(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "rounded_slot.nc"))
blocks = reader.parse()
tool = Tool(tolerance=0.25)
tool.define_knots(knot_intervals=5)
tool.set_initial_conditions(blocks[0].start)
problem = GCodeSchedulerProblem(tool, blocks, n_segments=2)
problem.set_options({"verbose": 0})
problem.init()
run(problem, Simulator(problem, sample_time=0.002, update_time=0.02))
print("gcode rounded slot: final", tool.signals["pose"][:3, -1],
      "segments:", len(blocks))

"""Eight-pointed star outline: 16 short straight blocks with alternating
sharp reversals -- the denser-star coverage point (reference family:
examples/GCode_examples/Star_Yverdon.nc; own geometry)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))  # repo-root import
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))
from omg_tools_tpu import Tool, GCodeReader, GCodeSchedulerProblem, Simulator
from _smoke import run

reader = GCodeReader()
reader.load_file(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "star_octa.nc"))
blocks = reader.parse()
tool = Tool(tolerance=0.35)
tool.define_knots(knot_intervals=5)
tool.set_initial_conditions(blocks[0].start)
problem = GCodeSchedulerProblem(tool, blocks, n_segments=2)
problem.set_options({"verbose": 0})
problem.init()
run(problem, Simulator(problem, sample_time=0.002, update_time=0.02))
print("gcode star_octa: final", tool.signals["pose"][:3, -1],
      "blocks:", len(blocks))

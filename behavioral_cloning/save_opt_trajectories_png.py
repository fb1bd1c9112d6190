"""Drop-in CLI shim (PNG layout)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pvr_habitat_tpu.tools.save_opt_trajectories import build_tool_parser
from pvr_habitat_tpu.tools.save_opt_trajectories_png import gen_data_habitat

if __name__ == "__main__":
    gen_data_habitat(build_tool_parser().parse_args())

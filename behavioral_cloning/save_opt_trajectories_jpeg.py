"""Drop-in CLI shim (JPEG layout, frameskip)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pvr_habitat_tpu.tools.save_opt_trajectories_jpeg import (
    build_jpeg_parser, gen_data_habitat)

if __name__ == "__main__":
    gen_data_habitat(build_jpeg_parser().parse_args())

"""Drop-in CLI shim: bulk embedding."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pvr_habitat_tpu.tools.save_embedded_obs import build_tool_parser, run

if __name__ == "__main__":
    run(build_tool_parser().parse_args())

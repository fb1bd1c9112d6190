"""BC on precomputed embeddings — drop-in CLI for the reference's
main_bc_2.py (same flags, file formats, and run naming)."""

from pvr_habitat_tpu.train.bc import run as _run
from pvr_habitat_tpu.utils.flags import parser


def run(flags):
    return _run(flags, mode="precomputed")


if __name__ == "__main__":
    run(parser.parse_args())

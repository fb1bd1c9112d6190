"""End-to-end BC on raw pixels (learned conv encoder) — drop-in CLI for
the reference's main_bc_finetune.py."""

from pvr_habitat_tpu.train.bc import run as _run
from pvr_habitat_tpu.utils.flags import parser


def run(flags):
    return _run(flags, mode="finetune")


if __name__ == "__main__":
    run(parser.parse_args())

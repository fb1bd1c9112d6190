"""BC with embed-at-load (for the seed-dependent 'random' encoder) —
drop-in CLI for the reference's main_bc_1.py."""

from pvr_habitat_tpu.train.bc import run as _run
from pvr_habitat_tpu.utils.flags import parser


def run(flags):
    return _run(flags, mode="embed_at_load")


if __name__ == "__main__":
    run(parser.parse_args())

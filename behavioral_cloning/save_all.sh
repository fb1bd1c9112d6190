#!/bin/bash
# Reference-equivalent scene loop (pickle layout, 10k trajectories/scene).
python -m pvr_habitat_tpu.tools.gen_all --layout pickle "$@"

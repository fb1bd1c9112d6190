#!/bin/bash
python -m pvr_habitat_tpu.tools.gen_all --layout png "$@"

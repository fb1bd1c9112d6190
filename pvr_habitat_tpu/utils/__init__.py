from pvr_habitat_tpu.utils.flags import build_parser, default_flags

"""Drop-in sweep launcher (reference: slurm_bc_finetune.py)."""
from pvr_habitat_tpu.tools import sweep

if __name__ == "__main__":
    import sys

    sys.argv.insert(1, "--kind")
    sys.argv.insert(2, "finetune")
    sweep.main()

"""Drop-in sweep launcher (reference: slurm_bc.py) — BC grid over
{scenes x embeddings x run_ids} with skip/resume."""
from pvr_habitat_tpu.tools import sweep

if __name__ == "__main__":
    import sys

    sys.argv.insert(1, "--kind")
    sys.argv.insert(2, "bc")
    sweep.main()

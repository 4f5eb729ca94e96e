#!/usr/bin/env python
"""Top-level shim matching the reference's entry point:
``python train.py {train,eval_only} --config configs/X.json ...``."""

from alignnet3d_tpu.cli import main

if __name__ == "__main__":
    main()

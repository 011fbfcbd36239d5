#!/usr/bin/env python
"""Reference-compatible entry point: ``python train.py --config ... ``.

Thin shim over ``primia_tpu.cli.train`` (the reference repo exposes
``train.py`` at its root; users coming from it expect the same verb).
"""

from primia_tpu.cli.train import main

if __name__ == "__main__":
    main()  # returns the best validation score; exit code stays 0

#!/usr/bin/env python
"""Reference-compatible entry point: ``python inference.py ...``.

Thin shim over ``primia_tpu.cli.inference`` (plain, remote and
``--encrypted_inference`` SMPC modes).
"""

from primia_tpu.cli.inference import main

if __name__ == "__main__":
    main()  # raises on failure; success exits 0

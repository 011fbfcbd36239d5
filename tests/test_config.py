"""Config-system tests: INI parsing parity with the reference semantics."""

import argparse
import textwrap

import pytest

from primia_tpu.config import Arguments, read_worker_config

MINI_INI = textwrap.dedent(
    """
    [config]
    batch_size = 8
    train_resolution = 64
    test_batch_size = 2
    test_interval = 1
    validation_split = 10
    epochs = 10
    lr = 1e-4
    end_lr = 1e-5
    restarts = 0
    beta1 = 0.5
    beta2 = 0.99
    weight_decay = 5e-4
    deterministic = yes
    seed = 42
    log_interval = 10
    optimizer = Adam
    differentially_private = no
    model = resnet-18
    pretrained = yes
    weight_classes = no
    pooling_type = max

    [augmentation]
    rotation = 30
    translate = 0.0
    scale = 0.15
    shear = 10
    mixup = yes
    mixup_prob = 0.9

    [albumentations]
    clahe = yes
    overall_prob = 0.75
    individual_probs = 0.2
    noise_std = 0.05
    noise_prob = 0.5
    randomgamma = yes
    randombrightness = yes
    blur = yes
    elastic = yes
    optical_distortion = yes
    grid_distortion = yes

    [federated]
    sync_every_n_batch = 3
    wait_interval = 0.1
    keep_optim_dict = no
    repetitions_dataset = 5
    weighted_averaging = no

    [system]
    num_threads = 16
    """
)


def _write_ini(tmp_path, text=MINI_INI):
    p = tmp_path / "cfg.ini"
    p.write_text(text)
    return p


def test_basic_parse(tmp_path):
    args = Arguments.from_ini(_write_ini(tmp_path))
    assert args.batch_size == 8
    assert args.lr == 1e-4 and args.end_lr == 1e-5
    assert args.model == "resnet-18" and args.pretrained
    assert args.clahe and args.randomgamma and not args.cutout
    assert args.inference_resolution == args.train_resolution == 64
    assert args.seed == 42 and args.deterministic


def test_federated_epoch_division(tmp_path):
    ns = argparse.Namespace(train_federated=True, unencrypted_aggregation=False)
    args = Arguments.from_ini(_write_ini(tmp_path), cmd_args=ns)
    # repetitions_dataset=5 divides epochs 10 -> 2 (reference utils.py:230-238)
    assert args.train_federated and args.epochs == 2
    assert args.sync_every_n_batch == 3
    assert args.precision_fractional == 16


def test_mixup_prob_one_doubles_batch(tmp_path):
    ini = MINI_INI.replace("mixup_prob = 0.9", "mixup_prob = 1.0")
    args = Arguments.from_ini(_write_ini(tmp_path, ini))
    assert args.batch_size == 16  # doubled (reference utils.py:210-212)


def test_round_trip(tmp_path):
    args = Arguments.from_ini(_write_ini(tmp_path))
    back = Arguments.from_json(args.to_json())
    assert back == args


def test_checkpoint_restore_flags(tmp_path):
    args = Arguments.from_ini(_write_ini(tmp_path))
    ns = argparse.Namespace(encrypted_inference=True, data_dir="other")
    args.from_previous_checkpoint(ns)
    assert args.encrypted_inference and args.mode == "inference"
    assert args.data_dir == "other"


def test_bad_model_rejected(tmp_path):
    ini = MINI_INI.replace("model = resnet-18", "model = alexnet")
    with pytest.raises(ValueError):
        Arguments.from_ini(_write_ini(tmp_path, ini))


def test_worker_csv(tmp_path):
    p = tmp_path / "w.csv"
    p.write_text(
        "id,alice,bob,charlie,crypto_provider\n"
        "host,127.0.0.1,127.0.0.1,127.0.0.1,127.0.0.1\n"
        "port,8777,8778,8779,8780\n"
    )
    cfg = read_worker_config(p)
    assert set(cfg) == {"alice", "bob", "charlie", "crypto_provider"}
    assert cfg["bob"]["port"] == "8778"


def test_all_shipped_and_reference_inis_parse():
    """Every configs/torch INI — ours and, when mounted, the reference's
    — must produce a valid Arguments."""
    import configparser
    import glob
    from pathlib import Path

    repo = Path(__file__).parent.parent
    ini_files = sorted(glob.glob(str(repo / "configs/torch/*.ini")))
    ref = Path("/root/reference/configs/torch")
    if ref.is_dir():
        ini_files += sorted(glob.glob(str(ref / "*.ini")))
    assert len(ini_files) >= 7
    for f in ini_files:
        cp = configparser.ConfigParser()
        assert cp.read(f), f
        del cp
        args = Arguments.from_ini(f, mode="train")
        args.validate()
        assert args.model in ("resnet-18", "vgg16", "simpleconv"), f

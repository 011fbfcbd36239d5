"""Training layer tests: losses vs torch, optimizers vs torch, LR schedule,
checkpoint round-trip, metrics, and an end-to-end 2-epoch fit on the
fixture dataset."""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from primia_tpu.config import Arguments
from primia_tpu.train import losses
from primia_tpu.train.lr import LearningRateScheduler
from primia_tpu.train.optim import adam, sgd


# --------------------------------------------------------------- losses

def test_cross_entropy_one_hot_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(8, 3)).astype(np.float32)
    tgt = rng.integers(0, 3, 8)
    oh = np.eye(3, dtype=np.float32)[tgt]
    w = np.array([0.2, 0.3, 0.5], np.float32)

    ours = float(losses.cross_entropy_one_hot(jnp.asarray(logits), jnp.asarray(oh),
                                              weight=jnp.asarray(w)))
    # reference formula (utils.py:420-428)
    lt = torch.tensor(logits)
    tt = torch.tensor(oh)
    wt = torch.tensor(w)
    ref = torch.mean(
        torch.sum(wt * tt, dim=1)
        * torch.sum(-tt * torch.nn.functional.log_softmax(lt, dim=1), dim=1)
    )
    assert abs(ours - float(ref)) < 1e-5


def test_cross_entropy_hard_matches_torch():
    import torch

    rng = np.random.default_rng(1)
    logits = rng.normal(size=(8, 3)).astype(np.float32)
    tgt = rng.integers(0, 3, 8)
    w = np.array([1.0, 2.0, 0.5], np.float32)
    ours = float(losses.cross_entropy(jnp.asarray(logits), jnp.asarray(tgt),
                                      weight=jnp.asarray(w)))
    ref = torch.nn.CrossEntropyLoss(weight=torch.tensor(w))(
        torch.tensor(logits), torch.tensor(tgt)
    )
    assert abs(ours - float(ref)) < 1e-5


def test_mixup_fixed_lambda():
    key = jax.random.PRNGKey(0)
    x = jnp.arange(12.0).reshape(4, 3)
    y = jax.nn.one_hot(jnp.array([0, 1, 2, 0]), 3)
    xm, ym = losses.mixup(key, x, y, lam=0.75, prob=1.0)
    assert xm.shape == x.shape and ym.shape == y.shape
    # row sums of mixed one-hots stay 1
    np.testing.assert_allclose(np.asarray(ym).sum(1), 1.0, atol=1e-6)


def test_mixup_prob_zero_is_identity():
    key = jax.random.PRNGKey(0)
    x = jnp.arange(12.0).reshape(4, 3)
    y = jax.nn.one_hot(jnp.array([0, 1, 2, 0]), 3)
    xm, ym = losses.mixup(key, x, y, lam=0.3, prob=0.0)
    np.testing.assert_allclose(np.asarray(xm), np.asarray(x))


def test_class_weights():
    labels = np.array([0, 0, 0, 1, 2, 2])
    w = losses.calc_class_weights(labels, 3)
    # 1/3, 1, 1/2 normalized
    expect = np.array([1 / 3, 1.0, 0.5])
    expect /= expect.sum()
    np.testing.assert_allclose(w, expect, rtol=1e-6)


def test_class_weights_empty_warns():
    with pytest.warns(UserWarning):
        w = losses.calc_class_weights(np.array([], np.int64), 3)
    assert w.tolist() == [1, 1, 1]


# ------------------------------------------------------------ optimizers

def _torch_train(opt_name, steps=5, **kw):
    import torch

    torch.manual_seed(0)
    p = torch.nn.Parameter(torch.tensor([[1.0, -2.0], [0.5, 3.0]]))
    if opt_name == "adam":
        opt = torch.optim.Adam([p], lr=0.1, betas=(0.9, 0.999), **kw)
    else:
        opt = torch.optim.SGD([p], lr=0.1, **kw)
    for _ in range(steps):
        opt.zero_grad()
        loss = (p ** 2).sum()
        loss.backward()
        opt.step()
    return p.detach().numpy()


def _ours_train(optimizer, steps=5):
    params = {"w": jnp.array([[1.0, -2.0], [0.5, 3.0]], jnp.float32)}
    state = optimizer.init(params)
    for _ in range(steps):
        grads = jax.tree.map(lambda p: 2 * p, params)
        params, state = optimizer.update(grads, state, params, 0.1)
    return np.asarray(params["w"])


def test_adam_matches_torch():
    ours = _ours_train(adam(0.9, 0.999))
    ref = _torch_train("adam")
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_adam_weight_decay_matches_torch():
    ours = _ours_train(adam(0.9, 0.999, weight_decay=0.1))
    ref = _torch_train("adam", weight_decay=0.1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_sgd_momentum_matches_torch():
    ours = _ours_train(sgd(momentum=0.9, weight_decay=0.01))
    ref = _torch_train("sgd", momentum=0.9, weight_decay=0.01)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


# ------------------------------------------------------------- schedule

def test_lr_log_linear_endpoints():
    s = LearningRateScheduler(10, -4.0, -5.0)
    assert abs(s.get_lr(0) - 1e-4) < 1e-10
    assert abs(s.get_lr(5) - 10 ** -4.5) < 1e-9


def test_lr_restarts_wrap():
    s = LearningRateScheduler(10, -4.0, -5.0, restarts=1)
    # cycle length 5: epoch 5 restarts at 1e-4
    assert abs(s.get_lr(5) - 1e-4) < 1e-10


def test_lr_log_cosine():
    s = LearningRateScheduler(10, -4.0, -5.0, schedule_plan="log_cosine")
    assert abs(s.get_lr(0) - 1e-4) < 1e-10
    with pytest.raises(NotImplementedError):
        LearningRateScheduler(10, -4, -5, schedule_plan="nope")


# ----------------------------------------------------------- checkpoint

def test_checkpoint_roundtrip(tmp_path):
    from primia_tpu.train import checkpoint as ckpt
    from primia_tpu.train.optim import adam as mk_adam

    params = {"layer": [{"w": jnp.ones((2, 3))}], "fc": {"b": jnp.zeros(3)}}
    opt = mk_adam()
    opt_state = opt.init(params)
    args = Arguments(model="resnet-18")
    p = tmp_path / "ck.pt"
    ckpt.save_model(
        p, epoch=3, params=params, model_state={"bn": {"count": jnp.zeros((), jnp.int64)}},
        opt_state=opt_state, args=args,
        val_mean_std=(np.array([0.5]), np.array([0.2])),
    )
    state = ckpt.load_model(p)
    assert state["epoch"] == 3
    assert state["args"].model == "resnet-18"
    np.testing.assert_allclose(state["model_state_dict"]["params"]["layer"][0]["w"],
                               np.ones((2, 3)))
    assert type(state["optim_state_dict"]).__name__ == "AdamState"
    np.testing.assert_allclose(state["val_mean_std"][0], [0.5])


def test_async_checkpoint_roundtrip_and_error_surface(tmp_path, monkeypatch):
    """With an executor, save_model returns a Future; the write happens
    in the background and errors surface through .result() instead of
    being silently swallowed (a dropped checkpoint must not go
    unnoticed)."""
    from concurrent.futures import ThreadPoolExecutor

    from primia_tpu.train import checkpoint as ckpt

    params = {"w": jnp.ones((2, 2))}
    args = Arguments(model="resnet-18")
    ex = ThreadPoolExecutor(max_workers=1)
    p = tmp_path / "ok.pt"
    fut = ckpt.save_model(
        p, epoch=1, params=params, model_state={}, opt_state=None, args=args,
        val_mean_std=(np.array([0.5]), np.array([0.2])), executor=ex,
    )
    assert fut is not None
    fut.result()
    assert ckpt.load_model(p)["epoch"] == 1

    # a failing background write must raise at .result()
    def boom(path, tree):
        raise OSError("disk full")

    monkeypatch.setattr(ckpt, "save_tree", boom)
    fut = ckpt.save_model(
        tmp_path / "bad.pt", epoch=2, params=params, model_state={},
        opt_state=None, args=args,
        val_mean_std=(np.array([0.5]), np.array([0.2])), executor=ex,
    )
    import pytest as _pytest

    with _pytest.raises(OSError, match="disk full"):
        fut.result()
    ex.shutdown(wait=True)


def test_save_config_results(tmp_path):
    import pandas as pd

    from primia_tpu.train.checkpoint import save_config_results

    f = tmp_path / "runs.csv"
    args = Arguments(save_file=str(f))
    save_config_results(args, 87.3)
    save_config_results(args, 90.0)
    df = pd.read_csv(f)
    assert len(df) == 2
    assert df["best_validation_score"].tolist() == [87.3, 90.0]


# -------------------------------------------------------------- metrics

def test_metrics_and_table():
    from primia_tpu.train import metrics as M

    targets = np.array([0, 0, 1, 1, 2, 2])
    preds = np.array([0, 1, 1, 1, 2, 0])
    logits = np.eye(3)[preds] * 3.0 + 0.1
    m = M.evaluate_predictions(targets, preds, logits)
    assert m["conf_matrix"].shape == (3, 3)
    assert -100 <= m["objective"] <= 100
    table = M.stats_table(m["conf_matrix"], m["report"], m["roc_auc"],
                          m["matthews_coeff"], ["a", "b", "c"], epoch=1)
    assert "matthews coeff" in table and "a" in table


# ------------------------------------------------------------ end-to-end

def test_fit_end_to_end(fixture_dir, tmp_path, monkeypatch):
    """2-epoch simpleconv training on the fixture set; the brightness-coded
    classes must be learnable to >random accuracy, and all artifacts of the
    reference contract must be produced."""
    monkeypatch.chdir(tmp_path)
    from primia_tpu.train.loop import main

    args = Arguments(
        model="simpleconv", train_resolution=28, inference_resolution=28,
        batch_size=6, test_batch_size=6, epochs=2, lr=0.05, end_lr=0.01,
        optimizer="SGD", momentum=0.5, seed=42, test_interval=1,
        data_dir=str(fixture_dir / "train"),
        save_file=str(tmp_path / "completed.csv"),
    )
    score = main(args, verbose=False, weights_dir=str(tmp_path / "w"))
    assert isinstance(score, float)
    finals = list((tmp_path / "w").glob("final_*.pt"))
    assert len(finals) == 1
    assert (tmp_path / "completed.csv").is_file()
    # intermediate checkpoints are cleaned up
    assert not list((tmp_path / "w").glob("*_epoch_*.pt"))

    # evaluate CLI runs on the final checkpoint
    from primia_tpu.cli.evaluate import main as eval_main

    m = eval_main([
        "--data_dir", str(fixture_dir / "test"),
        "--model_weights", str(finals[0]),
    ])
    assert m["accuracy"] >= 0.5  # 3 classes, brightness-separable

    # inference CLI emits the reference JSON contract
    from primia_tpu.cli.inference import run as infer_run

    class A:
        data_dir = str(fixture_dir / "test" / "normal")
        model_weights = str(finals[0])
        encrypted_inference = False
        websockets_config = None
        http_protocol = False
        batch_size = 4

    out = infer_run(A())
    assert set(out) == {"Inference Results"}
    assert len(out["Inference Results"]) == 4

    # encrypted inference CLI with the on-device batch tiling
    # (--mpc_batch_tile): same predictions as the plain path
    class AEnc(A):
        encrypted_inference = True
        protocol = "snn"
        mpc_batch_tile = 2

    out_enc = infer_run(AEnc())
    assert out_enc["Inference Results"] == out["Inference Results"]


def test_resume_four_way(tmp_path, fixture_dir):
    """The reference's 4 (was-federated x is-federated) resume
    combinations (train.py:345-389)."""
    import shutil

    from primia_tpu.config import Arguments
    from primia_tpu.train.loop import main as train_main

    def mk_args(fed, resume=None):
        return Arguments(
            model="simpleconv", train_resolution=28, inference_resolution=28,
            batch_size=4, test_batch_size=4, epochs=2 if resume else 1,
            test_interval=1, lr=1e-3, end_lr=1e-3, deterministic=True, seed=0,
            pretrained=False, train_federated=fed, unencrypted_aggregation=True,
            sync_every_n_batch=2, repetitions_dataset=1, save_file="",
            data_dir=str((fixture_dir / "train") if not fed else srv),
            resume_checkpoint=resume, keep_optim_dict=False,
        )

    # build a worker tree for the federated cases
    from primia_tpu.data.distribute import distribute

    srv = tmp_path / "srv"
    distribute(fixture_dir / "train", srv, num_workers=3, validation_split=25)

    wdir = str(tmp_path / "w")
    for was_fed in (False, True):
        train_main(mk_args(was_fed), verbose=False, weights_dir=wdir)
        ckpts = sorted(Path(wdir).glob("final_*.pt"))
        assert ckpts, "no checkpoint written"
        ck = str(ckpts[-1])
        for is_fed in (False, True):
            train_main(mk_args(is_fed, resume=ck), verbose=False,
                       weights_dir=str(tmp_path / f"w_{was_fed}_{is_fed}"))
        for c in Path(wdir).glob("*.pt"):
            c.unlink()

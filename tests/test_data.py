"""Data layer tests: folder scan, decode, DICOM round-trip, stats, batching."""

import numpy as np
import pytest

from primia_tpu.data import (
    BatchLoader,
    CombinedLoader,
    DicomLoader,
    ImageFolderDataset,
    PathDataset,
    Subset,
    calc_mean_std,
    load_dcm,
    random_split,
    write_dicom,
)


def test_image_folder_scan(fixture_dir):
    ds = ImageFolderDataset(fixture_dir / "train", channels=1)
    assert ds.classes == ["bacterial pneumonia", "normal", "viral pneumonia"]
    assert len(ds) == 12
    assert ds.class_counts().tolist() == [4, 4, 4]
    imgs, labels = ds.materialize(32)
    assert imgs.shape == (12, 32, 32, 1) and imgs.dtype == np.uint8
    assert labels.tolist() == sorted(labels.tolist())


def test_image_folder_3ch(fixture_dir):
    ds = ImageFolderDataset(fixture_dir / "train", channels=3)
    imgs, _ = ds.materialize(16)
    assert imgs.shape == (12, 16, 16, 3)
    # grayscale source -> identical channels
    assert np.array_equal(imgs[..., 0], imgs[..., 1])


def test_path_dataset(fixture_dir):
    d = fixture_dir / "train" / "normal"
    ds = PathDataset(d, channels=1)
    assert len(ds) == 4
    imgs, labels = ds.materialize(24)
    assert imgs.shape == (4, 24, 24, 1)
    assert labels is None


def test_random_split_and_subset(fixture_dir):
    ds = ImageFolderDataset(fixture_dir / "train", channels=1)
    a, b = random_split(ds, [9, 3], seed=7)
    assert len(a) == 9 and len(b) == 3
    assert set(a.paths) | set(b.paths) == set(ds.paths)
    assert not (set(a.paths) & set(b.paths))
    sub = Subset(ds, [0, 5])
    assert sub.labels.tolist() == [ds.labels[0], ds.labels[5]]


def test_random_split_length_mismatch(fixture_dir):
    ds = ImageFolderDataset(fixture_dir / "train", channels=1)
    with pytest.raises(ValueError):
        random_split(ds, [5, 5], seed=0)


def test_dicom_roundtrip_uint16(tmp_path):
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 2 ** 16, (40, 60), dtype=np.uint16)
    p = tmp_path / "img.dcm"
    write_dicom(p, arr)
    out = load_dcm(p)
    assert out.shape == (40, 60) and out.dtype == np.uint8
    expected = (arr.astype(np.float32) / 65535 * 255 + 0.5).astype(np.uint8)
    assert np.array_equal(out, expected)


def test_dicom_monochrome1_inverts(tmp_path):
    arr = np.zeros((8, 8), np.uint8)
    p = tmp_path / "m1.dcm"
    write_dicom(p, arr, photometric="MONOCHROME1")
    assert load_dcm(p).min() == 255


def test_dicom_enhance_stretches(tmp_path):
    arr = np.full((16, 16), 100, np.uint8)
    arr[0, 0], arr[0, 1] = 90, 110
    p = tmp_path / "e.dcm"
    write_dicom(p, arr)
    out = load_dcm(p, enhance=True)
    assert out.min() == 0 and out.max() == 255


def test_dicom_loader_channels(tmp_path):
    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    p = tmp_path / "c.dcm"
    write_dicom(p, arr)
    assert DicomLoader(1)(p).shape == (8, 8, 1)
    assert DicomLoader(3)(p).shape == (8, 8, 3)


def test_combined_loader_dispatch(tmp_path, fixture_dir):
    cl = CombinedLoader(channels=1)
    jpeg = next((fixture_dir / "train" / "normal").iterdir())
    assert cl(jpeg).shape[-1] == 1
    arr = np.zeros((4, 4), np.uint8)
    p = tmp_path / "x.dcm"
    write_dicom(p, arr)
    assert cl(p).shape == (4, 4, 1)
    with pytest.raises(RuntimeError):
        cl(tmp_path / "nope.xyz")


def test_calc_mean_std_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (20, 8, 8, 3), dtype=np.uint8)
    mean, std = calc_mean_std(x)
    xf = x.astype(np.float64) / 255.0
    ref_mean = xf.mean(axis=(0, 1, 2))
    ref_std = xf.std(axis=(0, 1, 2), ddof=1)
    np.testing.assert_allclose(mean, ref_mean, atol=1e-5)
    np.testing.assert_allclose(std, ref_std, atol=1e-5)


def test_batch_loader_padding():
    imgs = np.arange(10 * 4 * 4 * 1, dtype=np.uint8).reshape(10, 4, 4, 1)
    labels = np.arange(10, dtype=np.int32)
    bl = BatchLoader(imgs, labels, batch_size=4, shuffle=False)
    batches = list(bl)
    assert len(batches) == 3
    assert all(b.images.shape == (4, 4, 4, 1) for b in batches)
    assert batches[-1].mask.tolist() == [1, 1, 0, 0]
    got = np.concatenate([b.labels[b.mask > 0] for b in batches])
    assert got.tolist() == list(range(10))


def test_batch_loader_shuffles_between_epochs():
    imgs = np.zeros((8, 2, 2, 1), np.uint8)
    labels = np.arange(8, dtype=np.int32)
    bl = BatchLoader(imgs, labels, batch_size=8, shuffle=True, seed=1)
    e1 = next(iter(bl)).labels.tolist()
    e2 = next(iter(bl)).labels.tolist()
    assert sorted(e1) == list(range(8))
    assert e1 != e2


def test_calc_mean_std_histogram_exactness():
    """The histogram path must equal the direct float computation to
    float64 precision (it is algebraically the same moments)."""
    rng = np.random.default_rng(3)
    x = rng.integers(0, 256, (7, 9, 9, 3), dtype=np.uint8)
    mean, std = calc_mean_std(x)
    xf = x.reshape(-1, 3).astype(np.float64) / 255.0
    np.testing.assert_allclose(mean, xf.mean(0), rtol=1e-12)
    np.testing.assert_allclose(std, xf.std(0, ddof=1), rtol=1e-12)


def test_materialize_cache_roundtrip(tmp_path, fixture_dir, monkeypatch):
    from primia_tpu.data.datasets import ImageFolderDataset

    monkeypatch.setenv("PRIMIA_CACHE_DIR", str(tmp_path / "cache"))
    ds = ImageFolderDataset(fixture_dir / "train", channels=1)
    imgs1, labels1 = ds.materialize(24)
    cache_files = list((tmp_path / "cache" / "materialized").glob("*.npy"))
    assert len(cache_files) == 1
    imgs2, labels2 = ds.materialize(24)  # served from cache
    np.testing.assert_array_equal(imgs1, imgs2)
    np.testing.assert_array_equal(labels1, labels2)
    # different resolution -> different cache entry
    ds.materialize(16)
    assert len(list((tmp_path / "cache" / "materialized").glob("*.npy"))) == 2


def test_materialize_cache_invalidated_by_mtime(tmp_path, fixture_dir, monkeypatch):
    import shutil

    from primia_tpu.data.datasets import ImageFolderDataset

    monkeypatch.setenv("PRIMIA_CACHE_DIR", str(tmp_path / "cache"))
    root = tmp_path / "data"
    shutil.copytree(fixture_dir / "train", root)
    ds = ImageFolderDataset(root, channels=1)
    imgs1, _ = ds.materialize(24)
    # touch one file: key changes, cache misses, content re-decoded
    f = ds.paths[0]
    import os as _os
    st = _os.stat(f)
    _os.utime(f, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    imgs2, _ = ds.materialize(24)
    np.testing.assert_array_equal(imgs1, imgs2)
    assert len(list((tmp_path / "cache" / "materialized").glob("*.npy"))) == 2


def test_draft_decode_fidelity(tmp_path):
    """draft-mode decode + resize must match the full decode + resize
    closely (same DCT content, slightly different low-pass order)."""
    from PIL import Image

    from primia_tpu.data.datasets import pil_loader

    rng = np.random.default_rng(4)
    # smooth synthetic image so JPEG is near-lossless
    base = rng.normal(128, 10, (16, 16)).astype(np.uint8)
    big = np.asarray(Image.fromarray(base, "L").resize((1024, 1024), Image.BILINEAR))
    p = tmp_path / "big.jpeg"
    Image.fromarray(big, "L").save(p, quality=95)
    full = pil_loader(p, channels=1)          # no hint: full decode
    drafted = pil_loader(p, channels=1, target=224)
    assert drafted.shape[0] <= 512 and full.shape[0] == 1024
    a = np.asarray(Image.fromarray(full[:, :, 0]).resize((224, 224)), np.float64)
    b = np.asarray(Image.fromarray(drafted[:, :, 0]).resize((224, 224)), np.float64)
    assert np.abs(a - b).mean() < 2.0

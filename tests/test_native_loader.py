"""Native C++ loader tests: decode correctness vs cv2, LUT application,
batching/epoch semantics, and throughput sanity (SURVEY.md §2.3 native
tier). Skipped when g++/codecs are unavailable."""

import os

import numpy as np
import pytest

native = pytest.importorskip(
    "torch_semantic_segmentation_tpu.data.native_loader")

if not native.native_available():
    pytest.skip("native loader not built", allow_module_level=True)

import cv2


@pytest.fixture
def image_dir(tmp_path):
    rng = np.random.default_rng(0)
    imgs, lbls = [], []
    for i in range(6):
        img = rng.integers(0, 255, (20, 30, 3), np.uint8)
        lbl = rng.integers(0, 34, (20, 30), np.uint8)
        ip = str(tmp_path / f"img{i}.png")
        lp = str(tmp_path / f"lbl{i}.png")
        cv2.imwrite(ip, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        cv2.imwrite(lp, lbl)
        imgs.append(ip)
        lbls.append(lp)
    return imgs, lbls


def test_decode_png_matches_cv2(image_dir):
    imgs, lbls = image_dir
    got = native.decode_image(imgs[0], 3)
    want = cv2.cvtColor(cv2.imread(imgs[0], cv2.IMREAD_COLOR),
                        cv2.COLOR_BGR2RGB)
    np.testing.assert_array_equal(got, want)
    got_l = native.decode_image(lbls[0], 1)
    want_l = cv2.imread(lbls[0], cv2.IMREAD_GRAYSCALE)
    np.testing.assert_array_equal(got_l, want_l)


def test_decode_jpeg_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    img = np.repeat(rng.integers(0, 255, (16, 16, 1), np.uint8), 3, axis=2)
    p = str(tmp_path / "x.jpg")
    cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 100])
    got = native.decode_image(p, 3)
    assert got.shape == (16, 16, 3)
    # JPEG is lossy; high quality grayscale stays close
    assert np.abs(got.astype(int) - img.astype(int)).mean() < 4


def test_batch_loader_epoch_and_lut(image_dir):
    imgs, lbls = image_dir
    lut = np.full((256,), 255, np.uint8)
    lut[:34] = np.arange(34) % 19
    it = native.NativeBatchLoader(imgs, lbls, batch_size=2, height=20,
                                  width=30, num_threads=2, label_lut=lut,
                                  shuffle=False, epochs=1)
    batches = list(it)
    assert len(batches) == 3                       # 6 files / batch 2, 1 epoch
    for img, lbl in batches:
        assert img.shape == (2, 20, 30, 3) and img.dtype == np.uint8
        assert lbl.shape == (2, 20, 30)
        assert lbl.max() <= 18                     # LUT applied
    # unshuffled single thread keeps file order: batch0 == files 0,1
    want = cv2.cvtColor(cv2.imread(imgs[0], cv2.IMREAD_COLOR),
                        cv2.COLOR_BGR2RGB)
    it2 = native.NativeBatchLoader(imgs, lbls, batch_size=2, height=20,
                                   width=30, num_threads=1, shuffle=False,
                                   epochs=1)
    img0, _ = next(it2)
    np.testing.assert_array_equal(img0[0], want)
    it2.close()


def test_batch_loader_resizes_mixed_sizes(tmp_path):
    rng = np.random.default_rng(2)
    paths = []
    for i, (h, w) in enumerate([(20, 30), (10, 15), (40, 60)]):
        p = str(tmp_path / f"i{i}.png")
        cv2.imwrite(p, rng.integers(0, 255, (h, w, 3), np.uint8))
        paths.append(p)
    it = native.NativeBatchLoader(paths, None, batch_size=3, height=20,
                                  width=30, num_threads=1, shuffle=False,
                                  epochs=1)
    img = next(it)
    assert img.shape == (3, 20, 30, 3)
    it.close()


@pytest.fixture
def tagged_dir(tmp_path):
    """8 files whose constant pixel value identifies the sample index."""
    paths = []
    for i in range(8):
        p = str(tmp_path / f"t{i}.png")
        cv2.imwrite(p, np.full((8, 8, 3), i * 10, np.uint8))
        paths.append(p)
    return paths


def _id_stream(batches):
    return [int(img[b, 0, 0, 0]) // 10 for img in batches
            for b in range(img.shape[0])]


def test_native_loader_order_deterministic_across_threads(tagged_dir):
    """Regression (ADVICE r1 low): delivery is strictly by sequence number,
    so the consumer-visible stream is identical for any thread count."""
    streams = []
    for threads in (1, 4):
        it = native.NativeBatchLoader(tagged_dir, None, batch_size=2,
                                      height=8, width=8, num_threads=threads,
                                      shuffle=True, seed=7, epochs=2)
        streams.append(_id_stream(list(it)))
        it.close()
    assert streams[0] == streams[1]
    assert len(streams[0]) == 16


def test_native_loader_reshuffles_each_epoch(tagged_dir):
    """Regression (ADVICE r1 low): each epoch is a fresh (seed, epoch)
    permutation covering every sample, not one reused order."""
    it = native.NativeBatchLoader(tagged_dir, None, batch_size=2, height=8,
                                  width=8, num_threads=2, shuffle=True,
                                  seed=3, epochs=2)
    ids = _id_stream(list(it))
    it.close()
    e0, e1 = ids[:8], ids[8:]
    assert sorted(e0) == list(range(8)) and sorted(e1) == list(range(8))
    assert e0 != e1                       # reshuffled (deterministic seed)


def test_native_loader_start_batch_resumes_stream(tagged_dir):
    """start_batch=k continues exactly where batch k of the uninterrupted
    stream would be — the resume contract."""
    full = native.NativeBatchLoader(tagged_dir, None, batch_size=2, height=8,
                                    width=8, num_threads=2, shuffle=True,
                                    seed=11, epochs=2)
    want = _id_stream(list(full))[6:]      # skip 3 batches x 2 samples
    full.close()
    it = native.NativeBatchLoader(tagged_dir, None, batch_size=2, height=8,
                                  width=8, num_threads=2, shuffle=True,
                                  seed=11, epochs=2, start_batch=3)
    got = _id_stream(list(it))
    it.close()
    assert got == want


def test_native_loader_sample_slice_partitions_batch(tagged_dir):
    """Multi-host contract (VERDICT r2 next #5): loaders with slices
    (0, h) and (h, B) of the same (seed, epoch) stream emit exactly the
    halves whose concatenation is the full loader's batch — the C++
    equivalent of pipeline.batch_iterator(sample_slice=...)."""
    kw = dict(batch_size=4, height=8, width=8, num_threads=2, shuffle=True,
              seed=5, epochs=2)
    full = native.NativeBatchLoader(tagged_dir, None, **kw)
    want = list(full)
    full.close()
    parts = []
    for sl in ((0, 2), (2, 4)):
        it = native.NativeBatchLoader(tagged_dir, None, sample_slice=sl, **kw)
        parts.append(list(it))
        it.close()
    assert len(parts[0]) == len(parts[1]) == len(want)
    for lo_b, hi_b, w in zip(parts[0], parts[1], want):
        assert lo_b.shape == (2, 8, 8, 3)
        np.testing.assert_array_equal(np.concatenate([lo_b, hi_b]), w)
    with pytest.raises(ValueError):
        native.NativeBatchLoader(tagged_dir, None, sample_slice=(3, 2), **kw)


def test_dataset_adapter(image_dir, tmp_path):
    imgs, lbls = image_dir

    class DS:
        image_paths = imgs
        label_paths = lbls

    it = native.native_batch_iterator(DS(), 3, shuffle=True, epochs=2,
                                      num_threads=2)
    n = sum(1 for _ in it)
    assert n == 4                                  # 2 epochs x (6/3)

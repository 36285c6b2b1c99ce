"""Native C++ batch loader vs PIL reference (cervical_tpu/native)."""

import time

import numpy as np
import pytest
from PIL import Image

from cervical_tpu import native
from cervical_tpu.data.voc import VOCSegDataset, make_synthetic_voc, read_split

pytestmark = pytest.mark.skipif(not native.available(),
                                reason=f"native loader unavailable: "
                                       f"{native.unavailable_reason()}")


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    return make_synthetic_voc(str(tmp_path_factory.mktemp("voc")),
                              num_images=8, size=48)


def test_native_matches_pil(voc_root):
    ids = read_split(voc_root, "train")
    ds = VOCSegDataset(voc_root, ids, stage_hw=(48, 48))
    jpgs, pngs = zip(*(ds.paths(i) for i in range(4)))
    imgs, lbls, failures = native.load_batch(list(jpgs), list(pngs), (48, 48))
    assert failures == 0
    for i in range(4):
        ref_img, ref_lbl = ds.load(i)
        # JPEG decoders may differ by a few counts (IDCT variants)
        assert np.abs(imgs[i].astype(int) - ref_img.astype(int)).mean() < 3.0
        np.testing.assert_array_equal(lbls[i], ref_lbl)  # PNG is lossless


def test_native_resize(voc_root):
    ids = read_split(voc_root, "train")
    ds = VOCSegDataset(voc_root, ids, stage_hw=(48, 48))
    jpgs, pngs = zip(*(ds.paths(i) for i in range(2)))
    imgs, lbls, failures = native.load_batch(list(jpgs), list(pngs), (32, 32))
    assert failures == 0
    assert imgs.shape == (2, 32, 32, 3)
    assert lbls.shape == (2, 32, 32)
    assert set(np.unique(lbls)) <= set(range(5))


def test_native_missing_file_reports_failure(tmp_path):
    imgs, lbls, failures = native.load_batch([str(tmp_path / "nope.jpg")],
                                             [str(tmp_path / "nope.png")],
                                             (16, 16))
    assert failures == 2
    assert imgs.sum() == 0


def test_dataset_uses_native_batch(voc_root):
    ids = read_split(voc_root, "train")
    ds = VOCSegDataset(voc_root, ids, stage_hw=(48, 48), use_native=True)
    imgs, lbls = ds.load_batch(np.arange(4))
    assert imgs.shape == (4, 48, 48, 3)
    ds_pil = VOCSegDataset(voc_root, ids, stage_hw=(48, 48), use_native=False)
    imgs2, lbls2 = ds_pil.load_batch(np.arange(4))
    np.testing.assert_array_equal(lbls, lbls2)
    assert np.abs(imgs.astype(int) - imgs2.astype(int)).mean() < 3.0

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


def test_mask_sidecar_roundtrip(tmp_path):
    import os
    from cervical_tpu import native
    if not native.available():
        import pytest
        pytest.skip(native.unavailable_reason())
    from PIL import Image
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    msk = rng.integers(0, 5, (32, 32)).astype(np.uint8)
    jp = str(tmp_path / "a.jpg")
    pp = str(tmp_path / "a.png")
    Image.fromarray(img).save(jp, quality=95)
    Image.fromarray(msk).save(pp)
    i1, l1, f1 = native.load_batch([jp], [pp], (32, 32))
    assert f1 == 0
    side = pp + ".rawmask"
    assert os.path.exists(side)
    # second load comes from the sidecar and must be identical
    i2, l2, f2 = native.load_batch([jp], [pp], (32, 32))
    assert f2 == 0
    np.testing.assert_array_equal(l1, l2)
    np.testing.assert_array_equal(l1[0], msk)
    # stale sidecar (png re-written with different content size) is ignored
    msk2 = np.zeros((32, 32), np.uint8)
    msk2[:4, :17] = 3
    Image.fromarray(msk2).save(pp)
    _, l3, f3 = native.load_batch([jp], [pp], (32, 32))
    assert f3 == 0
    np.testing.assert_array_equal(l3[0], msk2)


def test_mask_sidecar_mtime_detects_size_collision(tmp_path):
    """A regenerated PNG of IDENTICAL byte size must not serve stale labels:
    the sidecar header carries the source mtime (loader.cc SidecarHeader),
    so a size collision alone cannot pass the freshness check."""
    import os
    import struct
    from cervical_tpu import native
    if not native.available():
        import pytest
        pytest.skip(native.unavailable_reason())
    from PIL import Image
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    msk_old = rng.integers(0, 5, (32, 32)).astype(np.uint8)
    msk_new = np.full((32, 32), 2, np.uint8)
    jp = str(tmp_path / "b.jpg")
    pp = str(tmp_path / "b.png")
    side = pp + ".rawmask"
    Image.fromarray(img).save(jp, quality=95)
    Image.fromarray(msk_old).save(pp)
    _, l1, f1 = native.load_batch([jp], [pp], (32, 32))
    assert f1 == 0 and os.path.exists(side)
    np.testing.assert_array_equal(l1[0], msk_old)

    # regenerate the png with different content, then FORGE the (stale)
    # sidecar's recorded size to collide with the new png while keeping the
    # old mtime field — the loader must reject it and decode the new png
    Image.fromarray(msk_new).save(pp)
    new_size = os.path.getsize(pp)
    with open(side, "r+b") as f:
        f.seek(4)
        f.write(struct.pack("<I", new_size))
    _, l2, f2 = native.load_batch([jp], [pp], (32, 32))
    assert f2 == 0
    np.testing.assert_array_equal(l2[0], msk_new)

    # control: a forged sidecar matching BOTH size and mtime is served —
    # proving the mtime mismatch is what rejected the collision above
    magic = 0x43524D33  # kSidecarMagic "CRM3"
    hdr = struct.pack("<IIiiq", magic, new_size, 32, 32,
                      os.stat(pp).st_mtime_ns)
    with open(side, "wb") as f:
        f.write(hdr + msk_old.tobytes())
    _, l3, f3 = native.load_batch([jp], [pp], (32, 32))
    assert f3 == 0
    np.testing.assert_array_equal(l3[0], msk_old)


def test_native_planar_layout(voc_root):
    """planar=True returns (N, 3, H, W) == transpose of the NHWC batch,
    for both the memcpy (native-size) and resize paths."""
    ids = read_split(voc_root, "train")
    ds = VOCSegDataset(voc_root, ids, stage_hw=(48, 48))
    jpgs, pngs = zip(*(ds.paths(i) for i in range(4)))
    for hw in ((48, 48), (32, 32)):  # native size (memcpy) + resize path
        nhwc, lbl_a, f_a = native.load_batch(list(jpgs), list(pngs), hw)
        plan, lbl_b, f_b = native.load_batch(list(jpgs), list(pngs), hw,
                                             planar=True)
        assert f_a == f_b == 0
        assert plan.shape == (4, 3) + hw
        np.testing.assert_array_equal(plan, nhwc.transpose(0, 3, 1, 2))
        np.testing.assert_array_equal(lbl_a, lbl_b)


def test_native_palette_mask_returns_indices(tmp_path):
    """Palette ('P'-mode) masks — the VOC convention, written by
    tools/labelme.py — must decode to raw palette *indices* (PIL
    semantics), not colormap luminance.  Covers 8-bit and packed 4-bit
    palette streams (loader.cc::decode_png_palette_indices)."""
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 5, (40, 40)).astype(np.uint8)
    pal = np.zeros((256, 3), np.uint8)
    pal[:5] = [[0, 0, 0], [128, 0, 0], [0, 128, 0],
               [128, 128, 0], [0, 0, 128]]
    im = Image.fromarray(idx, mode="P")
    im.putpalette(pal.reshape(-1).tolist())
    p8 = str(tmp_path / "m8.png")
    im.save(p8)
    p4 = str(tmp_path / "m4.png")
    im.save(p4, bits=4)
    # PIL oracle: 'P'-mode arrays are the palette indices
    np.testing.assert_array_equal(np.asarray(Image.open(p8)), idx)
    np.testing.assert_array_equal(np.asarray(Image.open(p4)), idx)
    jpg = str(tmp_path / "img.jpg")
    Image.fromarray(np.zeros((40, 40, 3), np.uint8)).save(jpg, quality=95)
    imgs, lbls, failures = native.load_batch([jpg, jpg], [p8, p4], (40, 40))
    assert failures == 0
    np.testing.assert_array_equal(lbls[0], idx)
    np.testing.assert_array_equal(lbls[1], idx)

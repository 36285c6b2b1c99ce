"""Offline multimodal feature pipeline tests (reference:
Graph_Structure(data_augmentation).py)."""

import numpy as np
import pytest

from cervical_tpu.data import graphs as G


def test_normalize_ages():
    ages = {1: 20, 2: 40, 3: 60}
    norm = G.normalize_ages(ages)
    assert norm[1] == -1.0 and norm[3] == 1.0 and norm[2] == 0.0


def test_age_one_hot_tiling():
    v = G.age_to_one_hot(37)  # bin 7
    assert v.shape == (1024,)
    assert v[7] == 1 and v.sum() == 1024 // 20 + (7 < 1024 % 20)
    # tiling repeats every 20
    assert v[27] == 1 and v[8] == 0


def test_age_one_hot_negative_wrap_quirk():
    # normalized ages are negative; reference floor-div indexes the last bin
    v = G.age_to_one_hot(-0.4, num_categories=20, vector_length=40)
    assert v[19] == 1  # wrapped


def test_embedding_table_deterministic():
    a = G.make_embedding_table(10, 16, seed=3)
    b = G.make_embedding_table(10, 16, seed=3)
    np.testing.assert_array_equal(a, b)
    c = G.make_embedding_table(10, 16, seed=4)
    assert not np.allclose(a, c)


def test_build_cli_features_shape():
    feats = G.build_cli_features({7: 35, 8: 52}, dim=64)
    assert feats[7].shape == (4, 64)
    assert not np.allclose(feats[7], feats[8])
    # row 0 is the raw-age one-hot
    assert set(np.unique(feats[7][0])) == {0.0, 1.0}


def test_resize_and_split():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    patches = G.resize_and_split(img, target_size=128, split_size=32)
    assert patches.shape == (16, 32, 32, 3)


@pytest.mark.slow
def test_patch_featurizer_small():
    f = G.PatchFeaturizer(depth=50, out_features=32, patch_size=16)
    rng = np.random.default_rng(1)
    patches = rng.integers(0, 255, (4, 16, 16, 3)).astype(np.uint8)
    out = f(patches)
    assert out.shape == (4, 32)
    assert np.isfinite(out).all()


def test_assemble_cohort_with_missing_modalities():
    rng = np.random.default_rng(2)
    image_feats = {
        "imgN": {1: rng.normal(size=(16, 8)).astype(np.float32),
                 2: rng.normal(size=(16, 8)).astype(np.float32)},
        "imgA": {1: rng.normal(size=(16, 8)).astype(np.float32)},  # 2 missing
    }
    cli = {1: rng.normal(size=(4, 8)).astype(np.float32),
           2: rng.normal(size=(4, 8)).astype(np.float32)}
    ds = G.assemble_cohort(image_feats, cli, {1: 0, 2: 3},
                           modalities=("imgN", "imgA", "cli"))
    assert ds["feats"]["imgN"].shape == (2, 16, 8)
    assert ds["present"][0].all()
    assert not ds["present"][1][1]  # imgA missing for patient 2
    np.testing.assert_array_equal(ds["feats"]["imgA"][1], 0)
    np.testing.assert_array_equal(ds["labels"], [0, 3])


def test_diagnosis_mapping():
    assert G.DIAGNOSIS_MAPPING["CIS"] == 0
    assert G.DIAGNOSIS_MAPPING["Severe dysplasia"] == 3

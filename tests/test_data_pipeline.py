"""Places365 index parsing, decode/normalize, threaded loader (SURVEY.md 2.4)."""

import numpy as np
import pytest
from PIL import Image

from semantic_pyramid_for_image_generation_tpu.config import PyramidGANConfig
from semantic_pyramid_for_image_generation_tpu.data.places365 import (
    Places365,
    Places365Loader,
)

CFG = PyramidGANConfig(image_size=32).tiny()


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("places")
    rng = np.random.default_rng(0)
    lines = []
    for cls in ("abbey", "airfield", "zoo"):
        d = root / "train" / cls
        d.mkdir(parents=True)
        for i in range(4):
            arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
            if cls == "zoo" and i == 0:  # exercise grayscale branch
                Image.fromarray(arr[:, :, 0], mode="L").save(d / f"{i}.png")
            else:
                Image.fromarray(arr).save(d / f"{i}.png")
            lines.append(f"train/{cls}/{i}.png")
    (root / "train.txt").write_text("\n".join(lines) + "\n")
    return str(root)


def test_index_and_labels(dataset_root):
    ds = Places365(dataset_root, "train.txt", CFG)
    assert len(ds) == 12
    # sorted-path first-seen ordering (data.py:24-31)
    assert ds.label_dict == {"abbey": 0, "airfield": 1, "zoo": 2}


def test_more_class_folders_than_num_classes_raises(dataset_root):
    """Labels must never silently alias via wraparound (VERDICT r3 weak 4):
    3 class folders with num_classes=2 is a configuration error."""
    import dataclasses

    cfg2 = dataclasses.replace(CFG, num_classes=2)
    with pytest.raises(ValueError, match="alias"):
        Places365(dataset_root, "train.txt", cfg2)


def test_sample_contract(dataset_root):
    ds = Places365(dataset_root, "train.txt", CFG)
    rng = np.random.default_rng(0)
    image, label, masks = ds.sample(0, rng)
    assert image.shape == (32, 32, 3)
    np.testing.assert_allclose(image.min(), -1.0, atol=1e-6)
    np.testing.assert_allclose(image.max(), 1.0, atol=1e-6)
    assert label.sum() == 1.0
    assert len(masks) == 7


def test_grayscale_broadcasts(dataset_root):
    ds = Places365(dataset_root, "train.txt", CFG)
    idx = ds.file_paths.index("train/zoo/0.png")
    image, _, _ = ds.sample(idx, np.random.default_rng(0))
    assert image.shape == (32, 32, 3)
    np.testing.assert_array_equal(image[..., 0], image[..., 1])


def test_loader_batches_and_epoch(dataset_root):
    ds = Places365(dataset_root, "train.txt", CFG)
    loader = Places365Loader(ds, batch_size=4, num_workers=2, seed=1)
    batches = list(loader)
    assert len(batches) == len(loader) == 3
    for b in batches:
        assert b["images"].shape == (4, 32, 32, 3)
        assert b["labels"].shape == (4, CFG.num_classes)
        assert len(b["masks"]) == 7
        assert b["masks"][0].shape == (4,) + CFG.mask_shapes[0]
    # second epoch reshuffles but still covers everything
    batches2 = list(loader)
    assert len(batches2) == 3


def test_abandoned_iterator_stops_producer(dataset_root):
    """Abandoning iteration must tear down the producer thread + worker pool
    (Trainer used to leak one pipeline per inference call — ADVICE r1)."""
    import threading
    import time

    ds = Places365(dataset_root, "train.txt", CFG)
    loader = Places365Loader(ds, batch_size=2, num_workers=2, prefetch=1,
                             seed=0)
    before = threading.active_count()
    it = iter(loader)
    next(it)
    it.close()  # GeneratorExit -> finally -> stop event
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_loader_native_masks_on_production_path(dataset_root):
    """The C++ batched mask kernel is the loader's default when built; both
    paths emit the same contract (7-level binary masks, batched shapes)."""
    from semantic_pyramid_for_image_generation_tpu.data import native

    ds = Places365(dataset_root, "train.txt", CFG)
    loader = Places365Loader(ds, batch_size=4, num_workers=2, seed=3)
    assert loader.use_native_masks == native.native_available()
    assert native.native_available(), "native lib should auto-build in-tree"
    batch = next(iter(loader))
    assert len(batch["masks"]) == 7
    for i, m in enumerate(batch["masks"]):
        assert m.shape == (4,) + CFG.mask_shapes[i]
        assert set(np.unique(m)).issubset({0.0, 1.0})
    # numpy fallback produces the identical contract
    loader_np = Places365Loader(ds, batch_size=4, num_workers=2, seed=3,
                                use_native_masks=False)
    batch_np = next(iter(loader_np))
    for i, m in enumerate(batch_np["masks"]):
        assert m.shape == (4,) + CFG.mask_shapes[i]
    # images/labels are mask-path independent
    np.testing.assert_array_equal(batch["images"], batch_np["images"])
    np.testing.assert_array_equal(batch["labels"], batch_np["labels"])


def test_compact_feed_matches_float_feed(dataset_root):
    """uint8 feed + device-side normalize == float feed (the /255 cancels in
    the per-image min-max); masks are binary so uint8 is lossless."""
    from semantic_pyramid_for_image_generation_tpu.train.step import (
        ensure_m11_images,
    )

    ds = Places365(dataset_root, "train.txt", CFG)
    f32 = next(iter(Places365Loader(ds, batch_size=4, num_workers=2, seed=5,
                                    shuffle=False)))
    u8 = next(iter(Places365Loader(ds, batch_size=4, num_workers=2, seed=5,
                                   shuffle=False, compact_feed=True)))
    assert u8["images"].dtype == np.uint8
    assert all(m.dtype == np.uint8 for m in u8["masks"])
    import jax.numpy as jnp

    normalized = np.asarray(ensure_m11_images(jnp.asarray(u8["images"])))
    np.testing.assert_allclose(normalized, f32["images"], atol=1e-5)
    for a, b in zip(u8["masks"], f32["masks"]):
        np.testing.assert_array_equal(a.astype(np.float32), b)


@pytest.mark.slow
def test_train_step_accepts_compact_feed(dataset_root):
    """One fused train step on a uint8 compact-feed batch produces the same
    losses as the float-feed batch (device-side normalize, mask cast)."""
    import jax

    from semantic_pyramid_for_image_generation_tpu.train.state import (
        init_train_state,
        make_models,
        make_optimizers,
    )
    from semantic_pyramid_for_image_generation_tpu.train.step import (
        make_train_step,
    )

    # the generator requires the 256 contract; tiny() shrinks widths only
    cfg256 = PyramidGANConfig().tiny()
    ds = Places365(dataset_root, "train.txt", cfg256)
    f32 = next(iter(Places365Loader(ds, batch_size=4, num_workers=2, seed=9,
                                    shuffle=False)))
    u8 = next(iter(Places365Loader(ds, batch_size=4, num_workers=2, seed=9,
                                   shuffle=False, compact_feed=True)))
    g_tx, d_tx = make_optimizers()
    state = init_train_state(jax.random.key(0), cfg256, g_tx, d_tx)
    step = make_train_step(*make_models(cfg256), g_tx, d_tx, donate=False)
    import jax.numpy as jnp

    _, m_f32 = step(state, jax.tree.map(jnp.asarray, f32), jax.random.key(1))
    _, m_u8 = step(state, jax.tree.map(jnp.asarray, u8), jax.random.key(1))
    for k in m_f32:
        np.testing.assert_allclose(float(m_u8[k]), float(m_f32[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)


def test_max_length_subset_seeded(dataset_root):
    a = Places365(dataset_root, "train.txt", CFG, max_length=5, seed=7)
    b = Places365(dataset_root, "train.txt", CFG, max_length=5, seed=7)
    assert a.file_paths == b.file_paths
    assert len(a) == 5


def test_drop_first_index_line_compat(dataset_root):
    ds = Places365(dataset_root, "train.txt", CFG, drop_first_index_line=True)
    assert len(ds) == 11


@pytest.mark.parametrize("use_native_masks", [False, None])
def test_sharded_loaders_concat_to_global(dataset_root, use_native_masks):
    """Multi-host feeding (cli/main.py --multihost): loader shards emit
    contiguous slices of every global batch, with shuffle and mask draws
    seeded shard-independently, so concatenating the shards reproduces the
    unsharded loader bit-for-bit — each host decodes only 1/S of the JPEGs.
    Covers two epochs (lockstep reshuffle) and a ragged final batch
    (drop_last=False, array_split sizing). None -> auto mask path (native
    kernel when built)."""
    ds = Places365(dataset_root, "train.txt", CFG)
    kw = dict(batch_size=5, num_workers=2, seed=7, drop_last=False,
              use_native_masks=use_native_masks)
    loader = Places365Loader(ds, **kw)
    shards = [Places365Loader(ds, num_shards=2, shard_id=s, **kw)
              for s in range(2)]
    for _ in range(2):  # epochs advance in lockstep (fresh __iter__ each)
        global_batches = list(loader)
        shard_batches = [list(s) for s in shards]
        assert len(global_batches) == 3  # 12 samples / batch 5 -> 5,5,2
        assert all(len(sb) == 3 for sb in shard_batches)
        for gb, ab, bb in zip(global_batches, *shard_batches):
            n = gb["images"].shape[0]
            assert ab["images"].shape[0] == -(-n // 2)  # contiguous split
            for key in ("images", "labels"):
                np.testing.assert_array_equal(
                    np.concatenate([ab[key], bb[key]]), gb[key])
            for gm, am, bm in zip(gb["masks"], ab["masks"], bb["masks"]):
                np.testing.assert_array_equal(np.concatenate([am, bm]), gm)


def test_loader_shard_validation():
    with pytest.raises(ValueError):
        Places365Loader(None, batch_size=4, num_shards=2, shard_id=2)

"""Data pipeline: manifests, datasets, sampler, loader, transforms."""
import threading
import time
from pathlib import Path

import numpy as np
import pytest

from ragb_vae_tpu.data import (
    BucketBatchSampler,
    DataLoader,
    MixedBucketDataset,
    MultiLayerDataset,
    RandomBackgroundBlend,
    RgbaComponentDataset,
    TextAlphaBucketDataset,
    build_bucket_entries,
    create_component_dataloader,
    multilayer_collate,
)
from tests.data_fixtures import (
    make_components_tree,
    make_laion_tree,
    make_multilayer_tree,
    make_prism_pro_tree,
    make_prism_real_tree,
    make_text_alpha_tree,
)


@pytest.fixture(scope="module")
def trees(tmp_path_factory):
    base = tmp_path_factory.mktemp("data")
    return {
        "components": make_components_tree(base / "components"),
        "prism_real": make_prism_real_tree(base / "prism_real"),
        "prism_pro": make_prism_pro_tree(base / "prism_pro"),
        "laion": make_laion_tree(base / "laion"),
        "text_alpha": make_text_alpha_tree(base / "text_alpha"),
    }


def test_component_dataset_shapes(trees):
    ds = RgbaComponentDataset(trees["components"], split="train")
    assert len(ds) == 6
    s = ds[0]
    assert s["component"].shape == (64, 64, 4)
    assert s["composite"].dtype == np.float32
    assert s["composite"].max() <= 1.0
    assert s["bucket"] in ("w64-h64", "w128-h64")


def test_component_dataset_split_and_limit(trees):
    assert len(RgbaComponentDataset(trees["components"], split="val")) == 2
    assert len(RgbaComponentDataset(trees["components"], split="train", limit=3)) == 3


def test_component_dataset_blend_to_white(trees):
    ds = RgbaComponentDataset(trees["components"], split="train", blend_component_to_white=True)
    s = ds[0]
    np.testing.assert_allclose(s["component_white"][..., 3], 1.0)
    a = s["component"][..., 3:4]
    np.testing.assert_allclose(
        s["component_white"][..., :3], s["component"][..., :3] * a + (1 - a), atol=1e-6
    )


def test_create_component_dataloader_pad_collate(trees):
    # without metadata -> pad-collate to per-batch max dims
    dl = create_component_dataloader(
        trees["components"],
        split="train",
        batch_size=6,
        shuffle=False,
        dataset_kwargs={"include_metadata": False},
    )
    batch = next(iter(dl))
    assert batch["component"].shape == (6, 64, 128, 4)  # mixed buckets padded
    assert batch["composite"].shape == (6, 64, 128, 4)


def test_build_bucket_entries_all_schemas(trees):
    cfgs = [
        {"type": "components", "root": str(trees["components"])},
        {"type": "prism_real", "root": str(trees["prism_real"])},
        {
            "type": "prism_pro",
            "root": str(trees["prism_pro"]),
            "respect_manifest_split": False,
            "use_fg_non_overlap": True,
            "use_rep": False,
        },
        {"type": "laion_rgb", "root": str(trees["laion"]), "max_count": 3},
    ]
    entries = build_bucket_entries(cfgs, split="train")
    variants = {e["variant"] for e in entries}
    # components: component+composite; prism_real: base/whole/layer;
    # prism_pro: base/composite/fg (rep disabled); laion: rgb_only
    assert {"component", "composite", "base", "whole", "layer", "fg_non_overlap", "rgb_only"} <= variants
    assert "rep" not in variants
    assert sum(1 for e in entries if e["variant"] == "rgb_only") == 3
    # components tree: 6 train samples x 2 paths (prism_pro also emits
    # "composite" variants, so filter by root)
    comp_root = str(trees["components"])
    assert sum(1 for e in entries if e["root_dir"] == comp_root) == 12


def test_bucket_entries_splits_filter(trees):
    cfgs = [{"type": "components", "root": str(trees["components"]), "splits": ["val"]}]
    assert build_bucket_entries(cfgs, split="train") == []


def test_mixed_bucket_dataset(trees):
    entries = build_bucket_entries(
        [{"type": "components", "root": str(trees["components"])}], split="train"
    )
    ds = MixedBucketDataset(trees["components"], entries, include_metadata=True)
    assert len(ds) == 12
    s = ds[0]
    assert s["composite"].shape[2] == 4
    assert "variant" in s and "bucket" in s
    assert set(ds.bucket_to_indices) == {"w64-h64", "w128-h64"}


def test_mixed_bucket_dataset_getitems_matches_getitem(trees):
    """The batch-fetch path (native C++ decode when available, else the
    per-item fallback) must be sample-for-sample identical to __getitem__."""
    entries = build_bucket_entries(
        [{"type": "components", "root": str(trees["components"])}], split="train"
    )
    ds = MixedBucketDataset(trees["components"], entries, include_metadata=True)
    idx = ds.bucket_to_indices["w64-h64"][:4]  # bucket-pure, same dims
    batch = ds.getitems(idx)
    assert len(batch) == len(idx)
    for got, i in zip(batch, idx):
        want = ds[i]
        np.testing.assert_allclose(got["composite"], want["composite"], atol=1e-6)
        assert got["image_path"] == want["image_path"]
        assert got["bucket"] == want["bucket"]


def test_bucket_batch_sampler_purity_and_len(trees):
    entries = build_bucket_entries(
        [{"type": "components", "root": str(trees["components"])}], split="train"
    )
    ds = MixedBucketDataset(trees["components"], entries)
    for interleave in (False, True):
        sampler = BucketBatchSampler(
            ds.bucket_to_indices, batch_size=4, shuffle=True, interleave=interleave, seed=0
        )
        batches = list(sampler)
        assert len(batches) == len(sampler)
        seen = []
        for batch in batches:
            buckets = {ds.entries[i]["bucket"] for i in batch}
            assert len(buckets) == 1  # bucket-pure
            seen.extend(batch)
        assert sorted(seen) == list(range(len(ds)))  # full coverage, no dupes


def test_bucket_batch_sampler_drop_last():
    sampler = BucketBatchSampler({"a": list(range(5))}, batch_size=2, shuffle=False, drop_last=True)
    batches = list(sampler)
    assert len(batches) == 2 == len(sampler)
    assert all(len(b) == 2 for b in batches)


def test_bucket_batch_sampler_seeded_determinism():
    idx = {"a": list(range(10)), "b": list(range(10, 16))}
    s1 = list(BucketBatchSampler(idx, batch_size=3, shuffle=True, interleave=True, seed=7))
    s2 = list(BucketBatchSampler(idx, batch_size=3, shuffle=True, interleave=True, seed=7))
    assert s1 == s2
    s3 = BucketBatchSampler(idx, batch_size=3, shuffle=True, interleave=True, seed=7)
    s3.set_epoch(1)
    assert list(s3) != s1  # new epoch -> new order


def test_dataloader_with_sampler_and_threads(trees):
    entries = build_bucket_entries(
        [{"type": "components", "root": str(trees["components"])}], split="train"
    )
    ds = MixedBucketDataset(trees["components"], entries)
    sampler = BucketBatchSampler(ds.bucket_to_indices, batch_size=3, shuffle=True, seed=1)
    dl = DataLoader(ds, batch_sampler=sampler, num_workers=2, prefetch_batches=2)
    batches = list(dl)
    assert len(batches) == len(sampler)
    total = sum(b["composite"].shape[0] for b in batches)
    assert total == len(ds)
    assert batches[0]["composite"].ndim == 4


def test_dataloader_propagates_worker_errors(trees):
    class Broken:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise RuntimeError("boom")

    dl = DataLoader(Broken(), batch_size=2, num_workers=2, prefetch_batches=1)
    with pytest.raises(RuntimeError, match="boom"):
        list(dl)


def test_dataloader_validates_args(trees):
    with pytest.raises(ValueError):
        DataLoader(object())  # neither batch_size nor batch_sampler


class _Tiny:
    """12 items -> 6 batches of 2 (enough to outpace a slow consumer)."""

    def __len__(self):
        return 12

    def __getitem__(self, i):
        return {"x": np.full((2, 2, 1), float(i), np.float32)}


def _consume_slowly(dl, out):
    for batch in dl:
        time.sleep(0.05)  # consumer slower than decode: queue stays FULL
        out.append(batch)


def test_dataloader_slow_consumer_epoch_terminates():
    """Regression: with the prefetch queue full at producer exit, the
    end-of-stream sentinel used to be dropped (put_nowait -> queue.Full),
    hanging the consumer in q.get() forever at normal epoch end."""
    dl = DataLoader(_Tiny(), batch_size=2, prefetch_batches=2)
    out: list = []
    t = threading.Thread(target=_consume_slowly, args=(dl, out), daemon=True)
    t.start()
    t.join(timeout=30.0)
    assert not t.is_alive(), "epoch never terminated (sentinel lost)"
    assert len(out) == 6


def test_dataloader_error_delivered_through_full_queue():
    """Producer exceptions must surface even when the queue is full."""

    class BreaksLate:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i >= 6:
                raise RuntimeError("late boom")
            return {"x": np.zeros((2, 2, 1), np.float32)}

    dl = DataLoader(BreaksLate(), batch_size=2, prefetch_batches=1)
    holder: list = []

    def run():
        try:
            for _ in dl:
                time.sleep(0.05)
        except BaseException as exc:  # noqa: BLE001 - capture for assert
            holder.append(exc)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout=30.0)
    assert not t.is_alive(), "consumer hung instead of raising"
    assert holder and "late boom" in str(holder[0])


def test_text_alpha_dataset(trees):
    ds = TextAlphaBucketDataset(trees["text_alpha"], split="train")
    assert len(ds) == 4
    s = ds[0]
    assert s["gt"].shape == (64, 64, 4)
    assert s["text_alpha"].shape == (64, 64, 4)
    assert s["sample_name"] == "s0"
    assert list(ds.bucket_to_indices) == ["w64-h64"]


def test_text_alpha_missing_split(trees):
    with pytest.raises(FileNotFoundError):
        TextAlphaBucketDataset(trees["text_alpha"], split="nope")


def test_random_background_blend():
    rgba = np.zeros((8, 8, 4), dtype=np.float32)  # fully transparent black
    t = RandomBackgroundBlend(prob=1.0, keys=("component",), color_range=(0.5, 0.6), seed=0)
    out = t({"component": rgba})
    assert out["background_augmented"] is True
    assert 0.5 <= out["component"][..., :3].min() <= out["component"][..., :3].max() <= 0.6
    np.testing.assert_allclose(out["component"][..., 3], 1.0)

    t0 = RandomBackgroundBlend(prob=0.0, seed=0)
    out0 = t0({"component": rgba})
    assert out0["background_augmented"] is False
    np.testing.assert_array_equal(out0["component"], rgba)


def test_multilayer_dataset_and_collate(tmp_path):
    rendered = tmp_path / "rendered"
    json_root = tmp_path / "json"
    make_multilayer_tree(rendered, json_root, n=2)
    ds = MultiLayerDataset(rendered_root=rendered, json_root=json_root)
    assert len(ds) == 2
    batch = multilayer_collate([ds[0], ds[1]])
    assert batch["background"].shape == (2, 32, 32, 4)
    assert batch["components"].shape == (2, 2, 32, 32, 4)  # padded to max L=2
    assert batch["component_mask"].tolist() == [[True, False], [True, True]]
    assert batch["visible_masks"].shape == (2, 2, 32, 32)
    assert batch["composite"].shape == (2, 32, 32, 4)

"""Dataset shards, bucket sampler (epoch reseed, token budget), loader."""
import numpy as np

from lina_speech_tpu.data.dataset import (
    LengthBucketSampler,
    TokenizedTTSDataset,
    tts_data_loader,
)
from lina_speech_tpu.data.tokenizer import TextTokenizer


def make_items(n=20, seed=0):
    rng = np.random.default_rng(seed)
    return [
        {"audio_token": rng.integers(0, 50, (1, int(rng.integers(10, 80)))),
         "text": "word " * int(rng.integers(1, 5))}
        for _ in range(n)
    ]


def test_npz_roundtrip(tmp_path):
    items = make_items(5)
    path = str(tmp_path / "shard.npz")
    TokenizedTTSDataset.save_npz(path, items)
    ds = TokenizedTTSDataset(npz_paths=[path])
    assert len(ds) == 5
    np.testing.assert_array_equal(ds[2]["audio_token"], items[2]["audio_token"])
    assert ds[2]["text"] == items[2]["text"]


def test_bucket_sampler_budget_and_reseed():
    ds = TokenizedTTSDataset(make_items(40))
    sampler = LengthBucketSampler(ds.lengths(), max_tokens=300, max_batch_size=8, seed=3)
    batches = list(sampler)
    covered = sorted(i for b in batches for i in b)
    assert covered == list(range(40))  # every item exactly once
    for b in batches:
        max_len = max(int(ds.lengths()[i]) for i in b)
        assert max_len * len(b) <= 300 or len(b) == 1
        assert len(b) <= 8

    sampler.set_epoch(1)
    batches2 = list(sampler)
    assert sorted(i for b in batches2 for i in b) == covered
    assert batches != batches2  # epoch reseed changes composition/order


def test_loader_yields_schema():
    ds = TokenizedTTSDataset(make_items(10))
    sampler = LengthBucketSampler(ds.lengths(), max_tokens=400, max_batch_size=4)
    gen = tts_data_loader(ds, TextTokenizer(), sampler, pad_to_multiple=16)
    batch = next(gen)
    assert {"text_token", "audio_token", "encoder_mask", "crossatt_mask",
            "y_mask"} <= set(batch)
    assert batch["audio_token"].shape[1] % 16 == 0

"""File-backed TTS dataset + length-bucketed dynamic batch sampler.

The reference delegates this to an external LightningCLI datamodule (its
class_path is not in the repo; the batch schema is implied by
train_lina.py:73-78) with a dynamic batch sampler re-seeded per epoch
(train_lina.py:67-69). Here:

- :class:`TokenizedTTSDataset`: reads pre-tokenized utterances from .npz
  shards ({"audio_token_<i>": (q, n) int arrays, "text_<i>": str}) or an
  in-memory list.
- :class:`LengthBucketSampler`: groups utterances of similar token length
  into batches with a max-token budget (minimal padding waste — the TPU
  equivalent of dynamic batching, pairs with collate's pad_to_multiple shape
  bucketing), shuffled per epoch via ``set_epoch`` like the reference's
  sampler.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np


class TokenizedTTSDataset:
    def __init__(self, items: Optional[List[Dict]] = None,
                 npz_paths: Optional[Sequence[str]] = None):
        self.items: List[Dict] = list(items or [])
        for path in npz_paths or []:
            data = np.load(path, allow_pickle=True)
            idx = 0
            while f"audio_token_{idx}" in data:
                self.items.append(
                    {
                        "audio_token": data[f"audio_token_{idx}"],
                        "text": str(data[f"text_{idx}"]),
                    }
                )
                idx += 1

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, i: int) -> Dict:
        return self.items[i]

    def lengths(self) -> np.ndarray:
        return np.asarray([it["audio_token"].shape[-1] for it in self.items])

    @staticmethod
    def save_npz(path: str, items: Sequence[Dict]) -> None:
        arrays = {}
        for i, it in enumerate(items):
            arrays[f"audio_token_{i}"] = np.asarray(it["audio_token"])
            arrays[f"text_{i}"] = np.asarray(it["text"])
        np.savez(path, **arrays)


class LengthBucketSampler:
    """Yields lists of indices; batches are built greedily from
    length-sorted items under a max-token budget, batch order shuffled per
    epoch (``set_epoch`` re-seeds, reference train_lina.py:67-69)."""

    def __init__(self, lengths: np.ndarray, max_tokens: int = 8192,
                 max_batch_size: int = 64, seed: int = 0,
                 shuffle: bool = True):
        self.lengths = np.asarray(lengths)
        self.max_tokens = max_tokens
        self.max_batch_size = max_batch_size
        self.seed = seed
        self.shuffle = shuffle
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _build_batches(self, rng: np.random.Generator) -> List[List[int]]:
        order = np.argsort(self.lengths, kind="stable")
        if self.shuffle:
            # shuffle within coarse length bins to vary batch composition
            nbins = max(1, len(order) // (self.max_batch_size * 4))
            for chunk in np.array_split(order, nbins):
                rng.shuffle(chunk)
        batches, cur, cur_max = [], [], 0
        for i in order:
            n = int(self.lengths[i])
            new_max = max(cur_max, n)
            if cur and (new_max * (len(cur) + 1) > self.max_tokens
                        or len(cur) >= self.max_batch_size):
                batches.append(cur)
                cur, cur_max = [], 0
                new_max = n
            cur.append(int(i))
            cur_max = new_max
        if cur:
            batches.append(cur)
        return batches

    def __iter__(self) -> Iterator[List[int]]:
        rng = np.random.default_rng(self.seed + self.epoch)
        batches = self._build_batches(rng)
        if self.shuffle:
            rng.shuffle(batches)
        return iter(batches)

    def __len__(self) -> int:
        return len(self._build_batches(np.random.default_rng(self.seed + self.epoch)))


def tts_data_loader(dataset: TokenizedTTSDataset, tokenizer, sampler,
                    n_special: int = 3, pad_to_multiple: int = 64):
    """Endless epoch-looping iterator of collated batches."""
    from lina_speech_tpu.data.collate import collate_tts

    epoch = 0
    while True:
        sampler.set_epoch(epoch)
        for idx in sampler:
            yield collate_tts([dataset[i] for i in idx], tokenizer,
                              n_special=n_special, pad_to_multiple=pad_to_multiple)
        epoch += 1

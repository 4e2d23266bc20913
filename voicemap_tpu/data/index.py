"""Dataset index builder with CSV cache.

TPU-native rebuild of the reference's index path (reference:
``voicemap/librispeech.py :: LibriSpeechDataset.__init__ / index_subset`` —
SURVEY.md §3.3): walk ``<root>/LibriSpeech/<subset>`` for audio files, join
speaker metadata from ``SPEAKERS.TXT``, probe each file's length, build a
DataFrame(filepath, speaker_id, sex, seconds, samples), and cache it to
``<root>/<subset>.index.csv`` so the cold-start probe loop is paid once.
"""

from __future__ import annotations

import os
from typing import Dict, Sequence, Tuple

import numpy as np
import pandas as pd

from . import audio

AUDIO_EXTS = (".flac", ".wav")


def read_speakers_txt(path: str) -> pd.DataFrame:
    """Parse LibriSpeech's SPEAKERS.TXT ('|'-delimited, ';'-comment header).

    Reference: ``index_subset`` reads it with pandas ``delimiter='|'`` skipping
    the comment header (SURVEY.md §2.1 "Dataset index builder").
    """
    rows = []
    with open(path) as f:
        for line in f:
            if line.startswith(";") or not line.strip():
                continue
            parts = [p.strip() for p in line.split("|")]
            if len(parts) < 5:
                continue
            rows.append(
                {
                    "speaker_id": int(parts[0]),
                    "sex": parts[1],
                    "subset": parts[2],
                    "minutes": float(parts[3]),
                    "name": "|".join(parts[4:]),
                }
            )
    return pd.DataFrame(rows)


def subset_available(data_root: str, subset: str) -> bool:
    """True when the subset can be indexed without error: its directory
    exists under ``<root>/LibriSpeech/`` or a cached index CSV does."""
    return os.path.isdir(
        os.path.join(data_root, "LibriSpeech", subset)
    ) or os.path.isfile(os.path.join(data_root, f"{subset}.index.csv"))


def index_subset(data_root: str, subset: str) -> pd.DataFrame:
    """Walk one subset tree and probe every audio file.

    ★ This is the reference's I/O-bound cold-start loop (SURVEY.md §3.1);
    the probe reads container headers only (no decode).
    """
    ls_root = os.path.join(data_root, "LibriSpeech")
    speakers = read_speakers_txt(os.path.join(ls_root, "SPEAKERS.TXT"))
    sex_map: Dict[int, str] = dict(zip(speakers.speaker_id, speakers.sex))
    records = []
    subset_dir = os.path.join(ls_root, subset)
    if not os.path.isdir(subset_dir):
        raise FileNotFoundError(f"subset directory not found: {subset_dir}")
    for dirpath, _dirnames, filenames in sorted(os.walk(subset_dir)):
        for fname in sorted(filenames):
            if not fname.lower().endswith(AUDIO_EXTS):
                continue
            fpath = os.path.join(dirpath, fname)
            speaker_id = int(fname.split("-")[0])
            n_samples, sr = audio.probe(fpath)
            records.append(
                {
                    "filepath": os.path.relpath(fpath, data_root),
                    "speaker_id": speaker_id,
                    "sex": sex_map.get(speaker_id, "?"),
                    "samples": n_samples,
                    "sample_rate": sr,
                    "seconds": n_samples / sr,
                }
            )
    if not records:
        raise FileNotFoundError(f"no audio files under {subset_dir}")
    return pd.DataFrame(records)


def load_index(
    data_root: str, subsets: Sequence[str], use_cache: bool = True
) -> pd.DataFrame:
    """Load (or build + cache) the concatenated index for the given subsets.

    Cache layout matches the reference: ``<root>/<subset>.index.csv``
    (reference: ``LibriSpeechDataset.__init__`` cache hit/miss logic).
    """
    frames = []
    for subset in subsets:
        cache_path = os.path.join(data_root, f"{subset}.index.csv")
        if use_cache and os.path.exists(cache_path):
            df = pd.read_csv(cache_path)
        else:
            df = index_subset(data_root, subset)
            if use_cache:
                os.makedirs(data_root, exist_ok=True)
                df.to_csv(cache_path, index=False)
        df = df.assign(subset=subset)
        frames.append(df)
    out = pd.concat(frames, ignore_index=True)
    out = out.reset_index(drop=True)
    out["id"] = np.arange(len(out))
    return out

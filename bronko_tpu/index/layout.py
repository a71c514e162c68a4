"""Device-facing index layout.

Derives, from the host BronkoIndex, the flat device arrays the mapper
consumes. Global pileup space: all sequences of all genomes concatenated
(files in order, sequences in order), so one scatter covers every genome —
the reference's per-genome DashMaps (call.rs:1437-1480) become slices of a
single (4, T+1, 4) tensor. Per-posting scatter positions are precomputed at
load time: gpos = seq_offset + location + idx (the mapper adds idx for both
orientations, call.rs:1334/1361, so it folds into the posting itself).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from bronko_tpu.index.model import (
    BronkoIndex, CANON_SHIFT, FILE_MASK, FILE_SHIFT, IDX_MASK, SEQ_MASK, SEQ_SHIFT,
)
from bronko_tpu.ops.buckets import filtered_bucket_positions
from bronko_tpu.ops.map import MapConfig


@dataclass
class SeqSlice:
    file_id: int
    seq_id: int
    name: str
    offset: int  # offset into the global pileup position space
    length: int


@dataclass
class DeviceIndex:
    k: int
    keys: jnp.ndarray      # (U,) uint64
    offsets: jnp.ndarray   # (U+1,) int32
    postings: jnp.ndarray  # (P,) int64: gpos<<22 | idx | canonical<<5 | file_id<<6
    num_genomes: int
    total_len: int
    max_bucket: int
    seq_slices: list[SeqSlice]
    genome_lens: np.ndarray  # (G,) int64

    def map_config(self, n_fixed: int, use_full_kmer: bool) -> MapConfig:
        positions = tuple(filtered_bucket_positions(self.k, n_fixed, use_full_kmer))
        n_buckets = max(1, int(self.offsets.shape[0]) - 1)
        avg = int(self.postings.shape[0]) / n_buckets
        return MapConfig(
            k=self.k,
            positions=positions,
            max_bucket=self.max_bucket,
            num_genomes=self.num_genomes,
            total_len=self.total_len,
            lane_factor=min(self.max_bucket, max(4, int(np.ceil(avg)) + 2)),
        )

    def slices_for_file(self, file_id: int) -> list[SeqSlice]:
        return [s for s in self.seq_slices if s.file_id == file_id]


def build_device_index(index: BronkoIndex) -> DeviceIndex:
    seq_slices: list[SeqSlice] = []
    offset_table: dict[tuple[int, int], int] = {}
    cursor = 0
    for file_id, f in enumerate(index.files):
        for seq_id, s in enumerate(f.sequences):
            offset_table[(file_id, seq_id)] = cursor
            seq_slices.append(SeqSlice(file_id, seq_id, s.name, cursor, s.length))
            cursor += s.length
    total_len = cursor

    meta = index.post_meta
    idx = (meta & IDX_MASK).astype(np.int64)
    seq_id = ((meta >> SEQ_SHIFT) & SEQ_MASK).astype(np.int64)
    file_id = ((meta >> FILE_SHIFT) & FILE_MASK).astype(np.int64)
    canon = ((meta >> CANON_SHIFT) & 1).astype(np.int64)

    # (file,seq) -> offset as a flat lookup
    max_seq = int(seq_id.max()) + 1 if seq_id.size else 1
    table = np.zeros((len(index.files), max_seq), np.int64)
    for (fid, sid), off in offset_table.items():
        if sid < max_seq:
            table[fid, sid] = off
    seq_off = table[file_id, seq_id] if meta.size else np.zeros(0, np.int64)

    gpos = seq_off + index.post_loc.astype(np.int64) + idx
    pmeta = idx | (canon << 5) | (file_id << 6)
    postings = (gpos << 22) | pmeta

    genome_lens = np.asarray([f.total_len for f in index.files], np.int64)

    return DeviceIndex(
        k=index.k,
        keys=jnp.asarray(index.keys),
        offsets=jnp.asarray(index.offsets.astype(np.int32)),
        postings=jnp.asarray(postings),
        num_genomes=len(index.files),
        total_len=total_len,
        max_bucket=index.max_postings_per_bucket,
        seq_slices=seq_slices,
        genome_lens=genome_lens,
    )

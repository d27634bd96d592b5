"""Sequence I/O: FASTA and the 2-bit packed format.

The reference has no file I/O (sequences are generated in-process,
source.cpp:3190-3200); a real engine needs it. DNA letters ACGT(acgt) map
to 0..3; N/any-other maps to the query pad code (never matches). Protein
uses the 24-letter NCBI order (swtpu.core.protein).
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import numpy as np

_DNA_LUT = np.full(256, 4, dtype=np.uint8)
for i, c in enumerate("ACGT"):
    _DNA_LUT[ord(c)] = i
    _DNA_LUT[ord(c.lower())] = i


def encode_dna(seq: str) -> np.ndarray:
    """DNA string → codes 0..3 (unknown letters → pad 4)."""
    raw = np.frombuffer(seq.encode("ascii"), dtype=np.uint8)
    return _DNA_LUT[raw]


def decode_dna(codes: np.ndarray) -> str:
    return "".join("ACGTN"[min(int(c), 4)] for c in codes)


def read_fasta(path: str) -> Iterator[Tuple[str, str]]:
    """Yield (name, sequence) records."""
    name, chunks = None, []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith(">"):
                if name is not None:
                    yield name, "".join(chunks)
                name, chunks = line[1:].split()[0] if len(line) > 1 else "", []
            else:
                chunks.append(line)
    if name is not None:
        yield name, "".join(chunks)


def load_fasta_batch(
    path: str, alphabet: str = "dna", pad_to: int = 0, pad_code: int = 4
) -> Tuple[List[str], np.ndarray, np.ndarray]:
    """Read a FASTA file into a padded [N, L] batch.

    Returns (names, batch, lengths); L = max length rounded up to pad_to
    (if nonzero). Unknown/ambiguous letters become pad codes.
    """
    names, seqs = [], []
    for name, seq in read_fasta(path):
        names.append(name)
        if alphabet == "dna":
            seqs.append(encode_dna(seq))
        else:
            from swtpu.core.protein import encode_protein

            seqs.append(encode_protein(seq))
    lengths = np.array([len(s) for s in seqs], dtype=np.int64)
    L = int(lengths.max()) if seqs else 0
    if pad_to:
        L = -(-L // pad_to) * pad_to
    batch = np.full((len(seqs), L), pad_code, dtype=np.uint8)
    for i, s in enumerate(seqs):
        batch[i, : len(s)] = s
    return names, batch, lengths


def write_fasta(path: str, records) -> None:
    with open(path, "w") as f:
        for name, seq in records:
            f.write(f">{name}\n{seq}\n")


def save_packed_batch(
    path: str, names: List[str], batch: np.ndarray, lens: np.ndarray
) -> None:
    """Write a DNA batch as a 2-bit-packed .npz container (the reference's
    packed wire format, source.cpp:1580-1583, as a batch file).

    batch: [N, L] uint8 codes (pads allowed). L is padded to a multiple
    of 4. Codes >3 *within* lens (ambiguity codes like N) are recorded in
    a packed ``ambig`` bitmask so load restores them as pad codes instead
    of silently scoring as 'A' (advisor r03: ACGTN must not round-trip to
    ACGTA); the mask is only written when any in-length ambiguity exists,
    so clean files are unchanged.
    """
    from swtpu.core.encode import pack_2bit

    batch = np.asarray(batch, dtype=np.uint8)
    lens = np.asarray(lens, dtype=np.int64)
    L = -(-batch.shape[1] // 4) * 4
    if L != batch.shape[1]:
        batch = np.pad(batch, ((0, 0), (0, L - batch.shape[1])))
    packed = pack_2bit(np.where(batch > 3, 0, batch))
    in_len = np.arange(batch.shape[1])[None, :] < lens[:, None]
    ambig = (batch > 3) & in_len
    arrays = dict(
        packed=packed, lens=lens, names=np.asarray(names, dtype=object)
    )
    if ambig.any():
        arrays["ambig"] = np.packbits(ambig, axis=1)
    np.savez_compressed(path, **arrays)


def load_packed_batch(
    path: str, pad_to: int = 0, pad_code: int = 4, device: bool = False
) -> Tuple[List[str], np.ndarray, np.ndarray]:
    """Read a 2-bit-packed .npz batch; inverse of save_packed_batch.

    Returns (names, batch, lengths) exactly like load_fasta_batch.
    ``device=True`` decodes on the accelerator (kernels/xla/unpack.py —
    the reference's tuned unpack family collapses to one fused VPU pass
    there) and returns a committed jax array; the host path is numpy.
    """
    z = np.load(path, allow_pickle=True)
    packed, lens = z["packed"], z["lens"].astype(np.int64)
    names = [str(n) for n in z["names"]]
    ambig = None
    if "ambig" in z.files:  # in-length ambiguity codes (see save)
        ambig = np.unpackbits(z["ambig"], axis=1).astype(bool)
    if device:
        import jax.numpy as jnp

        from swtpu.kernels.xla.unpack import unpack_2bit_device

        batch = unpack_2bit_device(jnp.asarray(packed))
    else:
        from swtpu.core.encode import unpack_2bit

        batch = unpack_2bit(packed)
    L = batch.shape[1]
    Lp = -(-L // pad_to) * pad_to if pad_to else L
    mask = np.arange(L)[None, :] < lens[:, None]
    if ambig is not None:
        mask &= ~ambig[:, :L]
    if device:
        import jax.numpy as jnp

        batch = jnp.where(jnp.asarray(mask), batch, np.uint8(pad_code))
        if Lp != L:
            batch = jnp.pad(
                batch, ((0, 0), (0, Lp - L)), constant_values=pad_code
            )
    else:
        batch = np.where(mask, batch, np.uint8(pad_code))
        if Lp != L:
            batch = np.pad(
                batch, ((0, 0), (0, Lp - L)), constant_values=pad_code
            )
    return names, batch, lens

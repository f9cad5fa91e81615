"""Fused Pallas STFT power-spectrum kernel.

Computes framing + windowed DFT + |.|^2 in one pass: audio is framed
directly in VMEM (no HBM frame matrix — the XLA path materializes a 4x
audio-duplicating frame tensor at hop = n_fft/4) and each frame block runs
against a precomputed windowed real-DFT bank on the MXU (same structure as
``ops.pallas_cqt``; the DFT bank comes from ``ops.spectral.dft_bank``),
emitting the POWER spectrum:

    grid = (num_clip_blocks, num_frame_blocks, num_bin_tiles)
    block job: frames[clips c, block i]  (CB * BLOCK_T x n_fft)  built in
                                         VMEM once per (c, i)
               @ bank[tile j]            (n_fft x 2 * BIN_TILE)  pipelined
               -> re^2 + im^2            (CB, BLOCK_T, BIN_TILE) written out

The bank is stored in a bin-tiled column layout ([re | im] pairs per tile,
``split_bank_bf16``) so each grid step streams one 2 * BIN_TILE-column
slab — the full 2048-bin bank pair would otherwise occupy 16.8 MB of VMEM
and trip the scoped-allocation limit.

Batching ``CB`` clips per grid step is what makes the slab streaming
affordable: with one clip per step (the earlier vmapped formulation) every
(clip, frame-block) revisits all bank tiles, 61 GB of HBM slab traffic at
batch 128 — the measured kernel cost was DMA-bound, not MXU-bound.
CB = 8 divides that traffic by 8.

Precision: a single-pass f32 MXU dot runs as one bfloat16 pass, whose
rounding error scales with the FRAME energy, not the output bin — on tonal
audio quiet bins come out tens of dB wrong. ``exact=True`` (default) runs
the bf16x3 hi/lo split (error ~2^-16, final dB features within 4e-4 of the
FFT path) for 3x the MXU work, still far cheaper than the XLA alternative.

Used by ``features.STFT``/``features.MelSpec`` (``use_pallas='auto'``).
Replaces the hot path of the reference's librosa STFT
(``/root/reference/amt_tools/features/stft.py:66-72``).
"""

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

try:  # Element-indexed block dims (overlapping spans)
    from jax.experimental.pallas import Element
except ImportError:
    from jax._src.pallas.core import Element

__all__ = ['stft_power_pallas', 'pallas_stft_supported', 'split_bank_bf16',
           'DEFAULT_BIN_TILE', 'DEFAULT_CLIP_BLOCK']

# 128-bin slabs keep hi+lo double-buffered slabs at 4 MB so the f32 patch
# can take (clip_block * block_t) = 512 frames; 256-bin slabs + the big
# patch exceed the VMEM scoped-allocation limit
DEFAULT_BIN_TILE = 128
DEFAULT_CLIP_BLOCK = 8


def pallas_stft_supported(n_fft, hop_length):
    """Whether the fused STFT kernel's constraints hold for these params.

    Requires a TPU backend, lane-aligned (128) hop, hop dividing n_fft,
    and n_fft <= 2048: the default clip-batched tiling budgets its VMEM
    (patch scratch + double-buffered bank slabs) for n_fft = 2048; at 4096
    the same tiling would exceed the 16 MB scoped-allocation limit, so
    larger transforms take the XLA FFT path instead.
    """

    import jax

    if jax.default_backend() not in ('tpu', 'axon'):
        return False

    return (hop_length % 128 == 0 and n_fft % hop_length == 0 and
            n_fft <= 2048)


def split_bank_bf16(kernel, bin_tile=DEFAULT_BIN_TILE):
    """Split a [cos | -sin] DFT bank into bin-tiled (hi, lo) bf16 halves.

    ``kernel`` is (n_fft, 2 * n_bins) from ``ops.spectral.dft_bank``. The
    output column layout groups ``bin_tile`` bins per slab —
    ``[re_0 | im_0 | re_1 | im_1 | ...]`` — zero-padded to a whole number
    of slabs, so the kernel can stream one slab per grid step.

    Pure numpy (ml_dtypes bfloat16), so callers may build and cache the
    halves lazily even while being traced under an outer ``jit`` — jnp ops
    here would leak tracers.
    """

    import ml_dtypes
    import numpy as np

    kernel = np.asarray(kernel, dtype=np.float32)
    n_fft, two_bins = kernel.shape
    n_bins = two_bins // 2

    num_tiles = -(-n_bins // bin_tile)
    padded = num_tiles * bin_tile

    re = np.pad(kernel[:, :n_bins], ((0, 0), (0, padded - n_bins)))
    im = np.pad(kernel[:, n_bins:], ((0, 0), (0, padded - n_bins)))

    tiled = np.empty((n_fft, 2 * padded), dtype=np.float32)
    for j in range(num_tiles):
        tiled[:, 2 * j * bin_tile: (2 * j + 1) * bin_tile] = \
            re[:, j * bin_tile: (j + 1) * bin_tile]
        tiled[:, (2 * j + 1) * bin_tile: (2 * j + 2) * bin_tile] = \
            im[:, j * bin_tile: (j + 1) * bin_tile]

    hi = tiled.astype(ml_dtypes.bfloat16)
    lo = (tiled - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)

    return hi, lo


def _stft_kernel(audio_ref, khi_ref, klo_ref, out_ref, patch_ref, *,
                 clip_block, block_t, n_fft, hop_length, bin_tile, exact):
    """One (clip-block c, frame-block i, bin-tile j) step.

    The patch — ``clip_block`` clips x ``block_t`` frames — is built once
    per (c, i) pair (j == 0) and reused across the bin tiles; bank slabs
    stream per j but now cover ``clip_block`` clips of frames each.

    Alternatives measured and rejected on v5e: tiles-outer grids keep
    slabs resident but rebuild the patch per step (sublane-shifted copies
    are expensive in Mosaic — 35-40 ms vs 34.6 at batch 64); a single
    resident full bank is ~30% faster but its 16.8 MB VMEM footprint trips
    the 16 MB scoped-allocation limit in some surrounding graphs; a DFT
    symmetry fold would halve bank+FLOPs but needs an in-kernel flip,
    which this Mosaic version lacks (`rev` unimplemented); bf16 (hi, lo)
    patch scratches would halve the patch footprint, but dynamic-row
    stores into (2,1)-packed bf16 scratch fail to lower, so the patch
    stays f32.
    """

    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        def build_row(q, _):
            clip = q // block_t
            frame = q % block_t
            patch_ref[q, :] = audio_ref[clip,
                                        pl.ds(frame * hop_length, n_fft)]
            return 0

        jax.lax.fori_loop(0, clip_block * block_t, build_row, 0)

    patch = patch_ref[...]
    p_hi = patch.astype(jnp.bfloat16)

    acc = jnp.dot(p_hi, khi_ref[...], preferred_element_type=jnp.float32)

    if exact:
        # bf16x3: + hi*lo + lo*hi (the dropped lo*lo term is O(2^-16))
        p_lo = (patch - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc += jnp.dot(p_hi, klo_ref[...], preferred_element_type=jnp.float32)
        acc += jnp.dot(p_lo, khi_ref[...], preferred_element_type=jnp.float32)

    re = acc[:, :bin_tile]
    im = acc[:, bin_tile:]
    power = re * re + im * im

    out_ref[...] = power.reshape(clip_block, block_t, bin_tile)


def _pick_clip_block(batch):
    """Clip block for this batch.

    The clip dim sits on sublanes in the audio block, so the block size
    must be 8-divisible OR equal to the whole (padded) array dim;
    intermediate sizes fail Mosaic's block-shape divisibility check.
    Small batches take the whole batch per step (block == array dim);
    larger ones take 8 and pad up to a multiple of 8 in the caller.
    """

    return batch if batch <= DEFAULT_CLIP_BLOCK else DEFAULT_CLIP_BLOCK


@functools.partial(jax.jit, static_argnames=('n_fft', 'hop_length', 'center',
                                             'clip_block', 'block_t',
                                             'bin_tile', 'exact', 'interpret'))
def stft_power_pallas(audio, kernel_hi, kernel_lo, n_fft, hop_length,
                      center=True, clip_block=None, block_t=None,
                      bin_tile=DEFAULT_BIN_TILE, exact=True, interpret=False):
    """Fused STFT power spectrum, no HBM framing.

    ``audio`` is (N,) -> (n_bins, T) or (B, N) -> (B, n_bins, T).
    ``kernel_hi``/``kernel_lo`` are the bin-tiled bf16 halves of the
    ``ops.spectral.dft_bank`` (via :func:`split_bank_bf16` with the same
    ``bin_tile``). Frame algebra matches ``spectral.stft_mag``:
    T = 1 + N // hop with ``center``, 1 + (N - n_fft) // hop otherwise.
    """

    if n_fft % hop_length:
        raise ValueError('hop_length must divide n_fft for the fused kernel')

    if hop_length % 128:
        # The kernel's frame indexing promises lane alignment
        # (pl.multiple_of(..., 128)); a misaligned hop reaching Mosaic would
        # fail obscurely or slice wrongly. Explicit use_pallas=True bypasses
        # pallas_stft_supported, so fail loudly here too.
        raise ValueError('hop_length must be a multiple of 128 (TPU lane '
                         'alignment) for the fused kernel')

    audio = jnp.asarray(audio)
    n_bins = n_fft // 2 + 1

    single = audio.ndim == 1
    if single:
        audio = audio[None, :]
    batch = audio.shape[0]

    if clip_block is None:
        clip_block = _pick_clip_block(batch)

    # Pad partial clip blocks (their frames compute and are sliced away)
    if batch % clip_block:
        pad_clips = clip_block - batch % clip_block
        audio = jnp.pad(audio, ((0, pad_clips), (0, 0)))

    # Mosaic constraint on the audio block's sublane (clip) dim: the block
    # size must be 8-divisible or span the whole padded batch (interpret
    # mode does not enforce this, so tests may use other sizes)
    if not interpret and clip_block % 8 and clip_block != audio.shape[0]:
        raise ValueError(
            f'clip_block={clip_block} must be a multiple of 8 or equal to '
            f'the padded batch ({audio.shape[0]}) on TPU')
    if block_t is None:
        # Patch scratch is (clip_block * block_t, n_fft) f32 — sized so
        # the bank slabs still double-buffer under the VMEM cap; the
        # output block's sublane dim needs block_t to be 8-divisible
        block_t = 128 if clip_block <= 2 else 512 // clip_block
        block_t = max(8, block_t - block_t % 8)

    num_tiles = -(-n_bins // bin_tile)
    if kernel_hi.shape != (n_fft, 2 * num_tiles * bin_tile):
        raise ValueError(
            f'bank shape {kernel_hi.shape} does not match the bin-tiled '
            f'layout for n_fft={n_fft}, bin_tile={bin_tile} — build it with '
            f'split_bank_bf16(dft_bank(...), bin_tile={bin_tile})')

    num_samples = audio.shape[-1]
    if center:
        num_frames = 1 + num_samples // hop_length
        pad_left = n_fft // 2
    else:
        num_frames = max(0, 1 + (num_samples - n_fft) // hop_length)
        pad_left = 0

    num_blocks = -(-num_frames // block_t)
    padded_batch = audio.shape[0]
    num_clip_blocks = padded_batch // clip_block

    # Tail padding so every frame span is in bounds
    span = (block_t - 1) * hop_length + n_fft
    total = (num_blocks * block_t - 1) * hop_length + n_fft
    audio = jnp.pad(audio, ((0, 0), (pad_left,
                            max(0, total - pad_left - num_samples) + span)))

    out = pl.pallas_call(
        functools.partial(_stft_kernel, clip_block=clip_block,
                          block_t=block_t, n_fft=n_fft,
                          hop_length=hop_length, bin_tile=bin_tile,
                          exact=exact),
        grid=(num_clip_blocks, num_blocks, num_tiles),
        in_specs=[
            # Overlapping audio spans for clip block c, frame block i;
            # element-indexed — hop is a multiple of 128 so the sample
            # offset stays lane-aligned
            pl.BlockSpec((Element(clip_block), Element(span)),
                         lambda c, i, j: (c * clip_block, pl.multiple_of(
                             i * block_t * hop_length, 128))),
            # One [re | im] bank slab per bin tile, pipelined HBM -> VMEM;
            # j is the fastest grid dim, so each fetched slab serves a
            # whole clip_block x block_t patch before moving on
            pl.BlockSpec((n_fft, 2 * bin_tile), lambda c, i, j: (0, j)),
            pl.BlockSpec((n_fft, 2 * bin_tile), lambda c, i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((clip_block, block_t, bin_tile),
                               lambda c, i, j: (c, i, j)),
        out_shape=jax.ShapeDtypeStruct((padded_batch, num_blocks * block_t,
                                        num_tiles * bin_tile), jnp.float32),
        scratch_shapes=[pltpu.VMEM((clip_block * block_t, n_fft),
                                   jnp.float32)],
        interpret=interpret,
    )(audio, kernel_hi, kernel_lo)

    out = out[:batch, :num_frames, :n_bins].swapaxes(-1, -2)

    return out[0] if single else out

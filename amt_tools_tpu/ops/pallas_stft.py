"""Pallas TPU kernel: fused framing + windowed-DFT contraction for STFT/Mel.

The XLA path (``ops.spectral.stft_mag``) materializes the (T, n_fft) frame
matrix in HBM (4x audio duplication at hop 512 / n_fft 2048) and runs the
XLA FFT over it — both stages are HBM-bandwidth bound and together cost
~80 ms for a 64 x 60 s batch on v5e. This kernel keeps the raw audio in
HBM, element-indexes each frame block straight into VMEM, and contracts it
against a precomputed windowed real-DFT bank on the MXU (same structure as
``ops.pallas_cqt``; the DFT bank comes from ``ops.spectral.dft_bank``),
emitting the POWER spectrum:

    grid = (num_frame_blocks, num_bin_tiles)
    block job: frames[block]    (BLOCK_T x n_fft)        built in VMEM once
               @ bank[tile]     (n_fft x 2 * BIN_TILE)   pipelined to VMEM
               -> re^2 + im^2   (BLOCK_T x BIN_TILE)     written out

The bank is stored in a bin-tiled column layout ([re | im] pairs per tile,
``split_bank_bf16``) so each grid step streams one 2 * BIN_TILE-column
slab — the full 2048-bin bank pair would otherwise occupy 16.8 MB of VMEM
and trip the scoped-allocation limit.

Precision: a single-pass f32 MXU dot runs as one bfloat16 pass, whose
rounding error scales with the FRAME energy, not the output bin — on tonal
audio the heavy spectral cancellation then corrupts quiet bins by up to
~10 dB. The kernel therefore defaults to a manual bf16x3 contraction
(hi/lo splits of both operands, dropping only the lo*lo term), which is
exact to ~4e-4 in the final [0, 1] dB feature scale while still ~3x faster
than the FFT path; ``exact=False`` selects the single-pass mode for
error-tolerant serving (measured 5.4x, with the quiet-bin caveat above).
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
           'DEFAULT_BIN_TILE']

DEFAULT_BIN_TILE = 256


def pallas_stft_supported(n_fft, hop_length):
    """Whether the fused STFT kernel's constraints hold for these params.

    Requires a TPU backend, lane-aligned (128) hop, hop dividing n_fft, and
    n_fft <= 4096 (the frame patch must fit VMEM comfortably).
    """

    import jax

    if jax.default_backend() not in ('tpu', 'axon'):
        return False

    return (hop_length % 128 == 0 and n_fft % hop_length == 0 and
            n_fft <= 4096)


def split_bank_bf16(kernel, bin_tile=DEFAULT_BIN_TILE):
    """Split a [cos | -sin] DFT bank into bin-tiled (hi, lo) bf16 halves.

    ``kernel`` is (n_fft, 2 * n_bins) from ``ops.spectral.dft_bank``. The
    output column layout groups ``bin_tile`` bins per slab —
    ``[re_0 | im_0 | re_1 | im_1 | ...]`` — zero-padded to a whole number
    of slabs, so the kernel can stream one slab per grid step.

    Pure numpy (ml_dtypes bfloat16), so callers may build and cache the
    halves lazily even while being traced under an outer ``jit`` — jnp ops
    here would leak tracers into the cache.
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
                 block_t, n_fft, hop_length, bin_tile, exact):
    """One (frame-block i, bin-tile j) step: patch once, contract, emit.

    The patch is built once per frame block (j == 0) and reused across the
    bin tiles. Alternatives measured and rejected on v5e: tiles-outer grids
    keep slabs resident but rebuild the patch per step (sublane-shifted
    copies are expensive in Mosaic — 35-40 ms vs 34.6); a single resident
    full bank is ~30% faster (26 ms at batch 64) but its 16.8 MB VMEM
    footprint trips the 16 MB scoped-allocation limit in some surrounding
    graphs (it compiled in the bench pipeline, failed in a quantile probe);
    a DFT symmetry fold would halve bank+FLOPs but needs an in-kernel
    flip, which this Mosaic version lacks (`rev` unimplemented).
    """

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        def build_row(r, _):
            patch_ref[r, :] = audio_ref[0, pl.ds(r * hop_length, n_fft)]
            return 0

        jax.lax.fori_loop(0, block_t, build_row, 0)

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
    out_ref[...] = re * re + im * im


@functools.partial(jax.jit, static_argnames=('n_fft', 'hop_length', 'center',
                                             'block_t', 'bin_tile', 'exact',
                                             'interpret'))
def stft_power_pallas(audio, kernel_hi, kernel_lo, n_fft, hop_length,
                      center=True, block_t=128, bin_tile=DEFAULT_BIN_TILE,
                      exact=True, interpret=False):
    """Fused STFT power spectrum: (N,) audio -> (n_bins, T), no HBM framing.

    ``kernel_hi``/``kernel_lo`` are the bin-tiled bf16 halves of the
    ``ops.spectral.dft_bank`` (via :func:`split_bank_bf16` with the same
    ``bin_tile``). Frame algebra matches ``spectral.stft_mag``:
    T = 1 + N // hop with ``center``, 1 + (N - n_fft) // hop otherwise.
    """

    if n_fft % hop_length:
        raise ValueError('hop_length must divide n_fft for the fused kernel')

    audio = jnp.asarray(audio)
    n_bins = n_fft // 2 + 1

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

    # Tail padding so every frame span is in bounds
    span = (block_t - 1) * hop_length + n_fft
    total = (num_blocks * block_t - 1) * hop_length + n_fft
    audio = jnp.pad(audio, (pad_left,
                            max(0, total - pad_left - num_samples) + span))
    audio = audio[None, :]  # 2-D layout for the TPU

    out = pl.pallas_call(
        functools.partial(_stft_kernel, block_t=block_t, n_fft=n_fft,
                          hop_length=hop_length, bin_tile=bin_tile,
                          exact=exact),
        grid=(num_blocks, num_tiles),
        in_specs=[
            # Overlapping audio span for block i, element-indexed; hop is a
            # multiple of 128 so the offset stays lane-aligned
            pl.BlockSpec((Element(1), Element(span)),
                         lambda i, j: (0, pl.multiple_of(
                             i * block_t * hop_length, 128))),
            # One [re | im] bank slab per bin tile, pipelined HBM -> VMEM
            pl.BlockSpec((n_fft, 2 * bin_tile), lambda i, j: (0, j)),
            pl.BlockSpec((n_fft, 2 * bin_tile), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_t, bin_tile), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((num_blocks * block_t,
                                        num_tiles * bin_tile), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_t, n_fft), jnp.float32)],
        interpret=interpret,
    )(audio, kernel_hi, kernel_lo)

    return out[:num_frames, :n_bins].swapaxes(-1, -2)

"""Pallas TPU kernel: fused framing + wavelet-bank contraction for CQT/VQT.

The XLA path (``ops.spectral.cqt_mag``) gathers overlapping audio frames into
a (T, support) matrix before the matmul — at hop 512 and support 32768 every
audio sample is duplicated **64x** in HBM traffic. This kernel instead keeps
the raw audio in HBM, element-indexes each (frame-block, support-tile) span
straight into VMEM, builds the frame patch there, and accumulates the
contraction against the wavelet kernel tile-by-tile:

    grid = (num_frame_blocks, num_support_tiles)
    block job: frames[block, tile] (BLOCK_T x TILE_S)  built in VMEM
               @ kernel[tile]      (TILE_S x 2K)       pipelined by BlockSpec
               += acc              (BLOCK_T x 2K)      VMEM scratch

The magnitude |re + j im| is written on the last support tile. Audio is
pre-padded so every span is in bounds.
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

__all__ = ['cqt_mag_pallas', 'cqt_mag_pallas_grouped',
           'pallas_cqt_supported']


def pallas_cqt_supported(max_length, hop_length, tile_s=2048):
    """Whether the fused kernel's tiling constraints hold for these params.

    Requires lane-aligned (128) hop, tile_s a multiple of hop, and tile_s
    dividing the bank support.
    """

    import jax

    if jax.default_backend() not in ('tpu', 'axon'):
        return False

    return (hop_length % 128 == 0 and tile_s % hop_length == 0 and
            max_length % tile_s == 0)


def _cqt_kernel(audio_ref, kernel_ref, out_ref, patch_ref, acc_ref, *,
                block_t, tile_s, hop_length, n_bins, exact):
    """One (frame-block i, support-tile j) step of the fused contraction."""

    j = pl.program_id(1)
    num_tiles = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Build the (block_t, tile_s) patch in VMEM scratch: frame r of this
    # block covers audio span samples [r * hop, r * hop + tile_s)
    def build_row(r, _):
        patch_ref[r, :] = audio_ref[0, pl.ds(r * hop_length, tile_s)]
        return 0

    jax.lax.fori_loop(0, block_t, build_row, 0)

    # A default (single bf16 pass) dot's rounding error scales with the
    # FRAME energy, not the bin's response — off-resonance (quiet) bins of
    # tonal audio come out up to ~28 dB wrong. exact=True is the 6-pass
    # f32 contraction; exact='high' is a 3-pass bf16x3 hi/lo split done
    # in-kernel (the dropped lo*lo term is O(2^-16) of the frame energy —
    # measured <=2e-4 on the final [0, 1] dB feature scale) at ~2x the
    # speed: the kernel is MXU-pass-bound at 60-s serving shapes (the
    # block_t sweep was flat, so bank streaming hides behind the passes).
    # Mosaic lacks a native HIGH lowering, hence the manual split.
    _contract_tile(patch_ref, kernel_ref, acc_ref, exact)

    @pl.when(j == num_tiles - 1)
    def _():
        re = acc_ref[:, :n_bins]
        im = acc_ref[:, n_bins:]
        out_ref[...] = jnp.sqrt(re * re + im * im)


def _contract_tile(patch_ref, kernel_ref, acc_ref, exact):
    """One (patch tile) x (bank tile) contraction pass into the accumulator.

    Shared by the single-bank and grouped kernels; see ``_cqt_kernel`` for
    the precision rationale (exact=True: 6-pass f32; 'high': in-kernel
    bf16x3 hi/lo split, 3 MXU passes, error O(2^-16) of frame energy).
    """

    if exact == 'high':
        patch = patch_ref[...]
        bank = kernel_ref[...]
        p_hi = patch.astype(jnp.bfloat16)
        p_lo = (patch - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        k_hi = bank.astype(jnp.bfloat16)
        k_lo = (bank - k_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = jnp.dot(p_hi, k_hi, preferred_element_type=jnp.float32)
        acc += jnp.dot(p_hi, k_lo, preferred_element_type=jnp.float32)
        acc += jnp.dot(p_lo, k_hi, preferred_element_type=jnp.float32)
        acc_ref[...] += acc
    else:
        precision = (jax.lax.Precision.HIGHEST if exact
                     else jax.lax.Precision.DEFAULT)
        acc_ref[...] += jnp.dot(patch_ref[...], kernel_ref[...],
                                preferred_element_type=jnp.float32,
                                precision=precision)


def _cqt_grouped_kernel(audio_ref, kernel_ref, out_ref, patch_ref, acc_ref, *,
                        block_t, tile_s, hop_length, group_bins, starts,
                        num_jobs, exact):
    """One (frame-block i, job j) step of the grouped contraction.

    ``j`` walks a STATIC job list of (group, tile-within-group) pairs laid
    out group-major; ``starts`` are the first job index of each group.
    Group boundaries are compile-time constants, so the accumulator
    init/flush conditions are plain static comparisons on ``program_id``.
    """

    j = pl.program_id(1)

    is_start = j == starts[0]
    for s in starts[1:]:
        is_start = jnp.logical_or(is_start, j == s)

    @pl.when(is_start)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def build_row(r, _):
        patch_ref[r, :] = audio_ref[0, pl.ds(r * hop_length, tile_s)]
        return 0

    jax.lax.fori_loop(0, block_t, build_row, 0)

    _contract_tile(patch_ref, kernel_ref, acc_ref, exact)

    ends = tuple(starts[1:]) + (num_jobs,)
    is_end = j == ends[0] - 1
    for e in ends[1:]:
        is_end = jnp.logical_or(is_end, j == e - 1)

    @pl.when(is_end)
    def _():
        re = acc_ref[:, :group_bins]
        im = acc_ref[:, group_bins:]
        out_ref[...] = jnp.sqrt(re * re + im * im)


@functools.partial(jax.jit, static_argnames=('supports', 'bins_per_group',
                                             'hop_length', 'block_t',
                                             'tile_s', 'exact', 'interpret'))
def cqt_mag_pallas_grouped(audio, bank_stack, supports, bins_per_group,
                           hop_length, block_t=64, tile_s=2048, exact=True,
                           interpret=False):
    """Fused CQT over support-grouped wavelet banks as ONE Pallas kernel.

    The single-bank kernel pads every wavelet to the longest support;
    grouping bins by support removes the structural-zero rows (~2.4x
    fewer MXU passes at 192 bins @ 24/octave) — but one ``pallas_call``
    per group puts several distinct custom kernels in one XLA program,
    which this environment's tunnel compiler cannot digest. This variant
    keeps ONE kernel whose grid walks a static job list: grid =
    (num_frame_blocks, total_tiles) where job ``j`` is (group g, tile t)
    group-major; the audio BlockSpec offsets each job's span by the
    group's center-pad delta, and accumulator init/flush happen at the
    static group boundaries.

    Parameters
    ----------
    bank_stack : (sum(supports), 2 * gb) array
        Per-group wavelet banks (``ops.spectral.wavelet_bank`` on each
        bin range), column-padded to the widest group ``gb`` and
        row-concatenated in group order.
    supports : tuple of int
        Each group's support (rows in its bank slab); every entry must
        be a multiple of ``tile_s``.
    bins_per_group : tuple of int
        TRUE (unpadded) bin count per group; the output keeps only these
        columns.

    Returns the (n_bins, T) magnitudes, bit-comparable to running the
    single-bank kernel on the full padded bank.
    """

    audio = jnp.asarray(audio)
    bank_stack = jnp.asarray(bank_stack)

    if any(sup % tile_s for sup in supports) or tile_s % hop_length:
        raise ValueError('every group support must be a multiple of tile_s, '
                         'and tile_s a multiple of hop_length')
    gb = bank_stack.shape[-1] // 2

    max_support = max(supports)
    num_samples = audio.shape[-1]
    num_frames = 1 + num_samples // hop_length
    num_blocks = -(-num_frames // block_t)

    pad_left = max_support // 2
    span = (block_t - 1) * hop_length + tile_s
    total = (num_blocks * block_t - 1) * hop_length + max_support
    audio = jnp.pad(audio, (pad_left,
                            max(0, total - pad_left - num_samples) + span))
    audio = audio[None, :]

    # Static job table: job j -> (group, tile) group-major. The audio
    # offset of job j is j*tile_s + C_g where C_g folds the group's
    # job-start and its center-pad delta (both multiples of 128).
    starts = []
    consts = []
    j0 = 0
    for sup in supports:
        starts.append(j0)
        off_g = pad_left - sup // 2
        consts.append(off_g - j0 * tile_s)
        j0 += sup // tile_s
    num_jobs = j0
    starts = tuple(starts)
    consts = tuple(consts)

    def job_const(j):
        c = jnp.int32(consts[0])
        for s, cg in zip(starts[1:], consts[1:]):
            c = jnp.where(j >= s, jnp.int32(cg), c)
        return c

    def group_of(j):
        g = jnp.int32(0)
        for s in starts[1:]:
            g = g + (j >= s).astype(jnp.int32)
        return g

    grid = (num_blocks, num_jobs)

    out = pl.pallas_call(
        functools.partial(_cqt_grouped_kernel, block_t=block_t,
                          tile_s=tile_s, hop_length=hop_length,
                          group_bins=gb, starts=starts, num_jobs=num_jobs,
                          exact=exact),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Element(1), Element(span)),
                         lambda i, j: (0, pl.multiple_of(
                             i * block_t * hop_length + j * tile_s
                             + job_const(j), 128))),
            pl.BlockSpec((tile_s, 2 * gb), lambda i, j: (j, 0)),
        ],
        # 3-D output (group, frame, bin): Mosaic requires the block's
        # last dim be 128-divisible OR equal to the full array dim — gb
        # (64) is neither when flattened to (T, n_groups * gb), but as
        # its own trailing axis it matches exactly
        out_specs=pl.BlockSpec((None, block_t, gb),
                               lambda i, j: (group_of(j), i, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (len(supports), num_blocks * block_t, gb), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_t, tile_s), jnp.float32),
                        pltpu.VMEM((block_t, 2 * gb), jnp.float32)],
        interpret=interpret,
    )(audio, bank_stack)

    out = out[:, :num_frames, :]
    parts = [out[g, :, :nb] for g, nb in enumerate(bins_per_group)]
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
    return out.swapaxes(-1, -2)


@functools.partial(jax.jit, static_argnames=('max_length', 'hop_length',
                                             'block_t', 'tile_s', 'exact',
                                             'interpret'))
def cqt_mag_pallas(audio, kernel, max_length, hop_length, block_t=64,
                   tile_s=2048, exact=True, interpret=False):
    """Fused CQT magnitudes: (N,) audio -> (n_bins, T) without HBM framing.

    ``kernel`` is the (max_length, 2 * n_bins) real wavelet bank from
    ``ops.spectral.wavelet_bank``. ``tile_s`` must divide ``max_length`` and
    be a multiple of ``hop_length``. ``exact`` (default) runs the
    contraction at full f32 precision; ``exact=False`` is a single bf16
    pass, whose error corrupts quiet bins (see ``_cqt_kernel``).
    """

    if max_length % tile_s or tile_s % hop_length:
        raise ValueError('tile_s must divide max_length and be a multiple '
                         'of hop_length')

    audio = jnp.asarray(audio)
    kernel = jnp.asarray(kernel)
    n_bins = kernel.shape[-1] // 2

    num_samples = audio.shape[-1]
    num_frames = 1 + num_samples // hop_length

    num_blocks = -(-num_frames // block_t)

    # Center padding plus tail so every span is in bounds
    pad_left = max_length // 2
    span = (block_t - 1) * hop_length + tile_s
    total = (num_blocks * block_t - 1) * hop_length + max_length
    audio = jnp.pad(audio, (pad_left,
                            max(0, total - pad_left - num_samples) + span))
    audio = audio[None, :]  # 2-D layout for the TPU

    num_tiles = max_length // tile_s
    grid = (num_blocks, num_tiles)

    out = pl.pallas_call(
        functools.partial(_cqt_kernel, block_t=block_t, tile_s=tile_s,
                          hop_length=hop_length, n_bins=n_bins, exact=exact),
        grid=grid,
        in_specs=[
            # Overlapping audio span for (block i, tile j), element-indexed.
            # hop and tile_s are multiples of 128, so the offset is lane-aligned
            pl.BlockSpec((Element(1), Element(span)),
                         lambda i, j: (0, pl.multiple_of(
                             i * block_t * hop_length + j * tile_s, 128))),
            # Wavelet kernel tile j (pipelined HBM -> VMEM)
            pl.BlockSpec((tile_s, 2 * n_bins), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((block_t, n_bins), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((num_blocks * block_t, n_bins),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_t, tile_s), jnp.float32),
                        pltpu.VMEM((block_t, 2 * n_bins), jnp.float32)],
        interpret=interpret,
    )(audio, kernel)

    return out[:num_frames].swapaxes(-1, -2)

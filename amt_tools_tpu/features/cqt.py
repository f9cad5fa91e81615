"""Constant-Q / Variable-Q transform features as one framed matmul.

TPU-first re-design of the reference's librosa-backed VQT wrapper
(``features/vqt.py:17-241``, ``features/cqt.py:7-22``): instead of recursive
octave down-sampling (whose frame-count algebra the reference must re-derive
from librosa internals, ``features/vqt.py:64-165``), the whole transform is a
single contraction of center-padded audio frames against a precomputed
complex wavelet bank — uniform hop, MXU-shaped, and the default frame
algebra T = 1 + N // hop holds exactly.
"""

import numpy as np
import jax.numpy as jnp

from ..ops import spectral
from ..tools.instrument import note_to_midi, midi_to_hz
from .common import FeatureModule


class VQT(FeatureModule):
    """Variable-Q transform magnitude features -> (1, n_bins, T)."""

    def __init__(self, sample_rate=22050, hop_length=512, decibels=True,
                 fmin=None, n_bins=84, bins_per_octave=12, gamma=None,
                 frame_chunk=256, use_pallas='auto', exact=True,
                 grouped=False, group_size=64):
        super().__init__(sample_rate, hop_length, 1, decibels)

        # Contraction precision of the fused kernel: True = 6-pass f32
        # (reference-grade default), 'high' = in-kernel bf16x3 (3 MXU
        # passes, measured 1.47x at serving shapes; error <=2e-4 on the
        # final [0, 1] dB feature scale — the serving pipelines opt in)
        self.exact = exact

        if fmin is None:
            # C1 by default
            fmin = float(midi_to_hz(note_to_midi('C1')))
        self.fmin = fmin

        self.n_bins = n_bins
        self.bins_per_octave = bins_per_octave

        # Inverse of the constant Q factor
        self.alpha = 2.0 ** (1.0 / self.bins_per_octave) - 1

        if gamma is None:
            # Bandwidth offset default from the VQT paper / librosa docs
            gamma = 24.7 * self.alpha / 0.108
        self.gamma = gamma

        self.frame_chunk = frame_chunk

        # Precompute the wavelet bank once (host); kernel is
        # (support, 2 * n_bins) with [cos | -sin] halves
        freqs = spectral.cqt_frequencies(n_bins, self.fmin, bins_per_octave)
        if np.max(freqs) > sample_rate / 2:
            raise ValueError('Highest CQT bin exceeds the Nyquist frequency.')

        self._kernel, self._support = spectral.wavelet_bank(
            freqs, sample_rate, alpha=self.alpha, gamma=self.gamma)

        # Support-grouped banks for the fused kernel: wavelet support
        # halves per octave, but a single bank pads every bin to the
        # LONGEST support — at 192 bins @ 24/octave ~77% of the
        # contraction multiplies structural zeros. Splitting bins into
        # ``group_size``-sized groups, each padded only to its own
        # longest wavelet (rounded to the kernel's 2048-sample tile),
        # removes exactly those zero rows: per-group wavelets are
        # center-aligned identically (window sample m of bin k lands on
        # the same audio sample either way), so the grouped transform is
        # the same math. ``group_size=64`` makes each group's matmul 128
        # columns — one full MXU tile. 'auto' groups whenever the split
        # actually drops support tiles (it always does past one octave).
        # The groups run as ONE Pallas kernel whose grid walks a static
        # (group, tile) job list (``ops.pallas_cqt.cqt_mag_pallas_grouped``)
        # — one pallas_call per group would put several distinct custom
        # kernels in one XLA program, which wedges this environment's
        # tunnel AOT compile helper (probed 2026-08-20; RESULTS.md).
        # Chip-measured 2026-08-20: 1.7-1.9x at module scale, 1.051x on
        # the end-to-end guitar pipeline, exact to 1e-6 vs the full bank
        # (``bench.py tabcnn grouped-ab``). The guitar serving recipe
        # opts in; the class default stays False because grouping only
        # pays past ~2 octaves of support spread.
        self._groups = None
        tile = 2048
        if grouped and n_bins >= 2 * group_size:
            groups = []
            for s in range(0, n_bins, group_size):
                k_g, sup_g = spectral.wavelet_bank(
                    freqs[s: s + group_size], sample_rate,
                    alpha=self.alpha, gamma=self.gamma)
                groups.append((k_g, sup_g))
            grouped_tiles = sum(sup // tile for _, sup in groups)
            full_tiles = (self._support // tile) * len(groups)
            if grouped != 'auto' or grouped_tiles < full_tiles:
                self._groups = groups
                # Job-list layout for the single fused kernel: column-pad
                # every group's bank to the widest group, row-concatenate
                gb = max(k.shape[-1] // 2 for k, _ in groups)
                slabs = []
                for k_g, _ in groups:
                    nb = k_g.shape[-1] // 2
                    if nb < gb:
                        pad = np.zeros((k_g.shape[0], gb - nb), k_g.dtype)
                        k_g = np.concatenate(
                            [k_g[:, :nb], pad, k_g[:, nb:], pad], axis=1)
                    slabs.append(k_g)
                self._bank_stack = np.concatenate(slabs, axis=0)
                self._group_supports = tuple(sup for _, sup in groups)
                self._group_bins = tuple(k.shape[-1] // 2 for k, _ in groups)

        self.use_pallas = use_pallas

    def _pallas_enabled(self):
        """Whether to use the fused Pallas kernel (12x less HBM traffic)."""

        from ..ops.pallas_cqt import pallas_cqt_supported

        if self.use_pallas == 'auto':
            return pallas_cqt_supported(self._support, self.hop_length)

        return bool(self.use_pallas)

    def process_jax(self, audio):
        audio = jnp.asarray(audio)

        if self._pallas_enabled():
            from ..ops.pallas_cqt import cqt_mag_pallas

            # block_t stays at the kernel default (64): a measured chip
            # sweep (64/128/192/256, bit-exact outputs) was FLAT-to-worse
            # (87.3/91.5/88.1/90.4 ms at batch 32 x 60 s) — the wavelet
            # bank's per-block re-streaming hides behind the MXU passes,
            # i.e. the kernel is compute-bound, not DMA-bound (RESULTS.md
            # round 5; block_t >= 512 additionally trips the 16 MB
            # scoped-vmem stack limit).
            if self._groups is not None:
                from ..ops.pallas_cqt import cqt_mag_pallas_grouped

                def one_clip(a):
                    return cqt_mag_pallas_grouped(
                        a, jnp.asarray(self._bank_stack),
                        self._group_supports, self._group_bins,
                        self.hop_length, exact=self.exact)
            else:
                def one_clip(a):
                    return cqt_mag_pallas(a, jnp.asarray(self._kernel),
                                          self._support, self.hop_length,
                                          exact=self.exact)

            if audio.ndim == 1:
                mag = one_clip(audio)
            else:
                # Batched audio: vmap the fused kernel over lead axes
                import jax

                lead = audio.shape[:-1]
                flat = audio.reshape((-1, audio.shape[-1]))
                mag = jax.vmap(one_clip)(flat)
                mag = mag.reshape(lead + mag.shape[1:])

            # Keep XLA from fusing the dB post-processing INTO the Pallas
            # kernel's consumer: fused, the CQT stage measures 73.8 ms at
            # batch 32 x 60 s on v5e vs 44.5 (kernel) + 4.5 (post_proc)
            # run separately — the fusion forces a bad layout/recompute on
            # the (bins, T) magnitudes. The barrier is an identity, so
            # outputs stay bit-equal; it recovers the stage to 46.3 ms.
            import jax

            mag = jax.lax.optimization_barrier(mag)
        else:
            # The XLA fallback matmul runs in f32 on CPU either way;
            # 'exact' only selects the fused kernel's pass count
            mag = spectral.cqt_mag(audio, jnp.asarray(self._kernel),
                                   self._support, self.hop_length,
                                   frame_chunk=self.frame_chunk)

        return self.post_proc(mag)

    def get_times(self, audio, at_start=False):
        times = super().get_times(audio)

        if at_start:
            # Compensate the latency of the longest (lowest-frequency) filter
            longest = spectral.wavelet_lengths(self.fmin, self.sample_rate,
                                               self.alpha, self.gamma)
            times = times - (longest // 2) / self.sample_rate

        return times

    def get_feature_size(self):
        return self.n_bins


class CQT(VQT):
    """Constant-Q transform: a VQT with gamma = 0."""

    def __init__(self, sample_rate=22050, hop_length=512, decibels=True,
                 fmin=None, n_bins=84, bins_per_octave=12, frame_chunk=256,
                 use_pallas='auto', exact=True, grouped=False,
                 group_size=64):
        super().__init__(sample_rate=sample_rate, hop_length=hop_length,
                         decibels=decibels, fmin=fmin, n_bins=n_bins,
                         bins_per_octave=bins_per_octave, gamma=0.0,
                         frame_chunk=frame_chunk, use_pallas=use_pallas,
                         exact=exact, grouped=grouped, group_size=group_size)

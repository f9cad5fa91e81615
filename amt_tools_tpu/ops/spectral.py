"""Spectral compute primitives (JAX device side) + filterbank construction (host).

TPU-first design notes
----------------------
- STFT = center-pad -> strided framing -> window -> ``jnp.fft.rfft`` (XLA FFT).
- Mel = |STFT|^2 @ precomputed mel filterbank — one MXU matmul.
- CQT/VQT = framed audio @ precomputed **complex wavelet bank** as a single
  real matmul against ``[cos | sin]`` columns. This replaces librosa's
  recursive octave down-sampling (``librosa/core/constantq.py``, wrapped by the
  reference at ``features/vqt.py:17-241``) with one big MXU-friendly
  contraction at a uniform hop, which also makes the frame-count algebra
  identical for every feature type (``1 + n // hop``).
- Long banks are applied in frame chunks (``lax.map``) to bound the
  materialized frame matrix.

All filterbank builders are NumPy (host, done once at module construction);
all ``*_jax`` functions are pure jnp and jit/vmap-safe.
"""

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    'hann_window',
    'frame_signal',
    'stft_mag',
    'dft_bank',
    'power_to_db',
    'amplitude_to_db',
    'hz_to_mel', 'mel_to_hz',
    'mel_filterbank',
    'cqt_frequencies',
    'wavelet_lengths',
    'wavelet_bank',
    'cqt_mag',
]


##################################################
# WINDOWS / FRAMING                              #
##################################################


def hann_window(win_length, periodic=True):
    """Hann window (periodic by default, matching FFT analysis convention)."""

    n = win_length + 1 if periodic else win_length
    window = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / max(1, n - 1))

    return window[:win_length].astype(np.float32)


def frame_signal(audio, frame_length, hop_length, center=True):
    """Split (..., N) audio into (..., T, frame_length) frames.

    With ``center`` the signal is zero-padded by ``frame_length // 2`` on both
    sides and T = 1 + N // hop, the canonical frame algebra used throughout
    the framework.

    When the hop divides the frame length (the common STFT configuration,
    e.g. 512 | 2048) framing is built from ``frame_length // hop`` contiguous
    slices of a hop-reshaped view instead of a gather — bit-identical output
    at memcpy speed (the gather lowering writes the frame matrix ~3x slower
    on TPU).
    """

    audio = jnp.asarray(audio)
    num_samples = audio.shape[-1]

    if center:
        pad = frame_length // 2
        num_frames = 1 + num_samples // hop_length
    else:
        pad = 0
        num_frames = max(0, 1 + (num_samples - frame_length) // hop_length)

    if frame_length % hop_length == 0 and num_frames > 0:
        # Slice-based framing: frame t = concat of hops [t, t + ratio)
        ratio = frame_length // hop_length
        num_hops = num_frames + ratio  # covers the last frame's tail
        total = num_hops * hop_length
        padding = [(0, 0)] * (audio.ndim - 1) + \
            [(pad, max(0, total - pad - num_samples))]
        padded = jnp.pad(audio, padding)[..., :total]

        hops = padded.reshape(audio.shape[:-1] + (num_hops, hop_length))
        parts = [jax.lax.slice_in_dim(hops, i, i + num_frames, axis=-2)
                 for i in range(ratio)]

        return jnp.concatenate(parts, axis=-1)

    if center:
        # Right padding sized so the final frame is fully in bounds even for
        # odd frame lengths (jnp.take would otherwise clip and silently
        # duplicate the edge sample)
        last_index = (num_frames - 1) * hop_length + frame_length
        rpad = max(pad, last_index - (num_samples + pad))
        padding = [(0, 0)] * (audio.ndim - 1) + [(pad, rpad)]
        audio = jnp.pad(audio, padding)

    starts = jnp.arange(num_frames) * hop_length
    # Gather-based framing: builds (T, frame_length) indices; XLA lowers this
    # to an efficient dynamic-slice/gather and fuses with the downstream matmul
    idcs = starts[:, None] + jnp.arange(frame_length)[None, :]

    return jnp.take(audio, idcs, axis=-1)


##################################################
# STFT                                           #
##################################################


def stft_mag(audio, n_fft, hop_length, win_length=None, center=True, window=None):
    """Magnitude spectrogram of (..., N) audio -> (..., n_fft//2+1, T)."""

    if win_length is None:
        win_length = n_fft
    if window is None:
        window = hann_window(win_length)
    window = jnp.asarray(window)

    # Center-pad the window to n_fft (librosa convention)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))

    frames = frame_signal(audio, n_fft, hop_length, center=center)
    spectrum = jnp.fft.rfft(frames * window, n=n_fft, axis=-1)

    # (..., T, F) -> (..., F, T)
    return jnp.abs(spectrum).swapaxes(-1, -2)


def dft_bank(n_fft, win_length=None, window=None, dtype=np.float32):
    """Windowed real-DFT matmul kernel: (n_fft, 2 * (n_fft//2 + 1)).

    Columns are ``[cos | -sin]`` halves so that framed audio
    ``(T, n_fft) @ kernel`` yields the real and imaginary rfft responses —
    the same layout as :func:`wavelet_bank`, letting the fused Pallas
    framing+contraction kernels compute STFT/Mel on the MXU instead of the
    XLA FFT. Built in float64 on the host and cast once.

    ``win_length < n_fft`` center-pads the window (librosa convention).
    """

    if win_length is None:
        win_length = n_fft
    if window is None:
        window = hann_window(win_length)

    window = np.asarray(window, dtype=np.float64)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = np.pad(window, (lpad, n_fft - win_length - lpad))

    bins = np.arange(n_fft // 2 + 1)
    angles = 2 * np.pi * np.outer(np.arange(n_fft), bins) / n_fft

    kernel = np.concatenate([np.cos(angles) * window[:, None],
                             -np.sin(angles) * window[:, None]], axis=1)

    return kernel.astype(dtype)


##################################################
# DECIBEL SCALING                                #
##################################################


def power_to_db(S, amin=1e-10, top_db=80.0, sample_ndim=None):
    """Power -> dB relative to the maximum entry (librosa ``ref=np.max``).

    ``sample_ndim`` gives the number of TRAILING axes that form one
    track's features (2 for an (F, T) spectrogram); any leading axes are
    independent samples, each normalized by its own maximum. This matches
    the reference, which runs librosa per track in a host loop — a batched
    in-graph frontend must not let one loud clip shift its batchmates' dB
    reference (and thereby their thresholded activations). ``None``
    reduces globally (the single-track behavior).
    """

    S = jnp.asarray(S)

    if sample_ndim is None:
        sample_ndim = S.ndim
    axes = tuple(range(S.ndim - min(sample_ndim, S.ndim), S.ndim))

    ref_value = jnp.maximum(amin, jnp.max(S, axis=axes, keepdims=True))

    log_spec = 10.0 * jnp.log10(jnp.maximum(amin, S))
    log_spec = log_spec - 10.0 * jnp.log10(ref_value)

    if top_db is not None:
        log_spec = jnp.maximum(log_spec, jnp.max(log_spec, axis=axes,
                                                 keepdims=True) - top_db)

    return log_spec


def amplitude_to_db(S, amin=1e-5, top_db=80.0, sample_ndim=None):
    """Amplitude -> dB relative to the maximum entry (librosa ``ref=np.max``)."""

    return power_to_db(jnp.square(S), amin=amin ** 2, top_db=top_db,
                       sample_ndim=sample_ndim)


##################################################
# MEL FILTERBANK                                 #
##################################################


def hz_to_mel(frequencies, htk=False):
    """Hz -> mel (Slaney by default, HTK optional)."""

    frequencies = np.asarray(frequencies, dtype=np.float64)

    if htk:
        return 2595.0 * np.log10(1.0 + frequencies / 700.0)

    # Slaney formula: linear below 1 kHz, logarithmic above
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (frequencies - f_min) / f_sp

    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0

    log_region = frequencies >= min_log_hz
    mels = np.where(log_region,
                    min_log_mel + np.log(np.maximum(frequencies, min_log_hz) / min_log_hz) / logstep,
                    mels)

    return mels


def mel_to_hz(mels, htk=False):
    """Mel -> Hz (inverse of :func:`hz_to_mel`)."""

    mels = np.asarray(mels, dtype=np.float64)

    if htk:
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)

    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels

    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0

    log_region = mels >= min_log_mel
    freqs = np.where(log_region,
                     min_log_hz * np.exp(logstep * (mels - min_log_mel)),
                     freqs)

    return freqs


def mel_filterbank(sample_rate, n_fft, n_mels=128, fmin=0.0, fmax=None, htk=False, norm='slaney'):
    """Triangular mel filterbank (n_mels, n_fft//2+1), Slaney-normalized."""

    if fmax is None:
        fmax = sample_rate / 2.0

    fft_freqs = np.linspace(0, sample_rate / 2.0, n_fft // 2 + 1)

    mel_pts = np.linspace(hz_to_mel(fmin, htk), hz_to_mel(fmax, htk), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts, htk)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))

    if norm == 'slaney':
        # Constant-energy normalization per filter
        enorm = 2.0 / (hz_pts[2: n_mels + 2] - hz_pts[:n_mels])
        weights *= enorm[:, None]

    return weights.astype(np.float32)


##################################################
# CQT / VQT WAVELET BANK                         #
##################################################


def cqt_frequencies(n_bins, fmin, bins_per_octave=12):
    """Center frequencies of geometrically-spaced CQT bins."""

    return fmin * (2.0 ** (np.arange(n_bins) / bins_per_octave))


def wavelet_lengths(freqs, sample_rate, alpha, gamma=0.0):
    """Filter length (samples) per center frequency: ``Q * sr / (f + gamma/alpha)``."""

    freqs = np.asarray(freqs, dtype=np.float64)
    Q = 1.0 / alpha

    return Q * sample_rate / (freqs + gamma / alpha)


def wavelet_bank(freqs, sample_rate, alpha, gamma=0.0, dtype=np.float32):
    """Build an L1-normalized complex wavelet bank as a real matmul kernel.

    Each filter is a Hann-windowed complex exponential of frequency-dependent
    length, centered in a common support of ``max_length`` samples. Returns
    ``(kernel, max_length)`` where ``kernel`` has shape
    ``(max_length, 2 * n_bins)`` with ``[cos | -sin]`` halves, so that framed
    audio ``(T, max_length) @ kernel -> (T, 2 * n_bins)`` yields the real and
    imaginary responses and ``|CQT| = sqrt(re^2 + im^2)``.

    L1 normalization makes a unit-amplitude tone at a bin's center frequency
    respond with magnitude ~0.5 in every bin (amplitude-linear, bin-uniform),
    which the downstream max-referenced dB scaling then normalizes away.
    """

    freqs = np.asarray(freqs, dtype=np.float64)
    lengths = wavelet_lengths(freqs, sample_rate, alpha, gamma)

    # Round the common support up to a multiple of the Pallas kernel's
    # support tile (2048) rather than a power of two: the contraction's
    # MXU passes and bank HBM traffic both scale with max_length, and
    # power-of-two rounding wastes up to ~2x on zeros (e.g. the guitar
    # recipe's fmin=C1 wavelet is 23,013 samples — 32,768 padded means
    # 42% dead work; 24,576 is exact-same math, 25% less of everything).
    # 2048 stays a multiple of every supported hop, so the XLA fallback
    # and frame algebra are unchanged.
    max_length = int(-(-int(np.ceil(np.max(lengths))) // 2048) * 2048)

    n_bins = len(freqs)
    kernel = np.zeros((max_length, 2 * n_bins), dtype=np.float64)

    t = np.arange(max_length)
    for k in range(n_bins):
        ilen = int(np.floor(lengths[k]))
        if ilen % 2 == 0:
            ilen += 1  # odd length centers cleanly
        start = (max_length - ilen) // 2
        # Symmetric Hann window over the filter's support
        window = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(ilen) / (ilen - 1))
        window /= np.sum(window)  # L1 normalization
        phase = 2 * np.pi * freqs[k] * (t[start: start + ilen] - max_length // 2) / sample_rate
        kernel[start: start + ilen, k] = window * np.cos(phase)
        kernel[start: start + ilen, n_bins + k] = -window * np.sin(phase)

    return kernel.astype(dtype), max_length


def cqt_mag(audio, kernel, max_length, hop_length, frame_chunk=256):
    """Apply a wavelet bank to (..., N) audio -> (..., n_bins, T).

    Frames the signal at the bank's support and contracts against the kernel
    in chunks of ``frame_chunk`` frames to bound the materialized frame
    matrix ((chunk, max_length) at a time).
    """

    audio = jnp.asarray(audio)
    kernel = jnp.asarray(kernel)
    n_bins = kernel.shape[-1] // 2

    frames = frame_signal(audio, max_length, hop_length, center=True)
    num_frames = frames.shape[-2]

    lead_shape = frames.shape[:-2]

    def apply_chunk(chunk):
        # Full-precision contraction: at TPU's default (single bf16 pass)
        # the rounding error scales with the frame energy and corrupts
        # quiet (off-resonance) bins by tens of dB on tonal audio
        resp = jnp.dot(chunk, kernel, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        re, im = resp[..., :n_bins], resp[..., n_bins:]
        return jnp.sqrt(re * re + im * im)

    if num_frames <= frame_chunk:
        # Small inputs: a single contraction, no chunking machinery
        mags = apply_chunk(frames)
    else:
        frames = frames.reshape((-1, num_frames, max_length))

        # Pad the frame axis to a multiple of the chunk size for a static scan
        num_chunks = -(-num_frames // frame_chunk)
        pad_frames = num_chunks * frame_chunk - num_frames
        frames = jnp.pad(frames, ((0, 0), (0, pad_frames), (0, 0)))

        # lax.map over chunks keeps peak memory at one (chunk, L) frame block
        mags = jax.lax.map(apply_chunk,
                           frames.reshape((-1, frame_chunk, max_length)))
        mags = mags.reshape(lead_shape + (num_chunks * frame_chunk, n_bins))
        mags = mags[..., :num_frames, :]

    return mags.swapaxes(-1, -2)

"""MicrophoneStream logic driven by an injected fake sounddevice.

``sounddevice``/``pynput`` are unavailable in CI, so the capture-thread
plumbing is exercised with fakes: ring-buffer continuity, hop accounting,
lag warnings, callback-thread locking, and the ENTER-stop listener
(reference behavior: ``amt_tools/features/stream.py:463-539, 618-634``).
"""

import threading
import time
import warnings

import numpy as np
import pytest

from amt_tools_tpu.features import stream as stream_mod


class FakeInputStream:
    """Deterministic stand-in for sounddevice.InputStream.

    Delivers a monotonically increasing ramp signal so tests can verify
    exactly which samples each extracted frame saw. ``push(n)`` feeds the
    next n samples through the registered callback synchronously.
    """

    def __init__(self, samplerate, channels, device, callback, **_kwargs):
        self.samplerate = samplerate
        self.channels = channels
        self.callback = callback
        self.next_sample = 0
        self.started = False
        self.closed = False

    def start(self):
        self.started = True

    def stop(self):
        self.started = False

    def close(self):
        self.closed = True

    def push(self, n):
        assert self.started
        samples = (np.arange(self.next_sample, self.next_sample + n)
                   .astype(np.float32))
        self.next_sample += n
        self.callback(samples, n, None, None)


class _FakeSounddevice:
    InputStream = FakeInputStream

    @staticmethod
    def query_devices():
        return ['fake-mic']


@pytest.fixture
def fake_sd(monkeypatch):
    monkeypatch.setattr(stream_mod, 'sd', _FakeSounddevice)
    monkeypatch.setattr(stream_mod, '_HAVE_SOUNDDEVICE', True)
    return _FakeSounddevice


class _IdentityModule:
    """Minimal FeatureModule contract: pass audio through unchanged."""

    sample_rate = 16000

    def get_num_samples_required(self):
        return 2048

    def get_hop_length(self):
        return 512

    def process_audio(self, audio):
        return np.asarray(audio)[None]   # (1, N)


def _module():
    return _IdentityModule()


def test_requires_sounddevice_without_fake():
    if stream_mod._HAVE_SOUNDDEVICE:
        pytest.skip('sounddevice actually available')
    with pytest.raises(RuntimeError, match='sounddevice'):
        stream_mod.MicrophoneStream(_module())


def test_ring_buffer_continuity(fake_sd):
    """Consecutive extractions advance by exactly one hop of the ramp."""

    module = _module()
    mic = stream_mod.MicrophoneStream(module, suppress_warnings=True)
    mic.start_streaming()

    required = module.get_num_samples_required()
    hop = module.get_hop_length()

    # Feed enough for the first frame in uneven chunks (exercises roll path)
    for chunk in (100, required - 150, 50):
        mic._stream.push(chunk)

    first = np.asarray(mic.extract_frame_features()).ravel()
    # One new hop arrives -> the freshest window advances by exactly one hop
    mic._stream.push(hop)
    second = np.asarray(mic.extract_frame_features()).ravel()

    # The ramp identifies sample indices: frames are contiguous slices
    # (no torn ring-buffer reads) and the window tracks the newest audio
    np.testing.assert_array_equal(np.diff(first), 1.0)
    np.testing.assert_array_equal(np.diff(second), 1.0)
    assert first.size == required
    assert first[-1] == required - 1
    assert second[0] - first[0] == hop

    mic.stop_streaming()
    assert mic.query_finished()
    assert mic._stream is None


def test_lag_warning(fake_sd):
    module = _module()
    mic = stream_mod.MicrophoneStream(module, suppress_warnings=False)
    mic.start_streaming()

    required = module.get_num_samples_required()
    hop = module.get_hop_length()

    # Fall far behind: 10 extra hops ~ 0.32 s > MIC_LAG_TOL (0.25 s)
    mic._stream.push(required + 10 * hop)

    with pytest.warns(RuntimeWarning, match='too slow'):
        mic.extract_frame_features()

    mic.stop_streaming()


def test_callback_thread_safety(fake_sd):
    """A producer thread hammers the callback while the main thread extracts."""

    module = _module()
    mic = stream_mod.MicrophoneStream(module, suppress_warnings=True)
    mic.start_streaming()

    stop = threading.Event()

    def producer():
        while not stop.is_set():
            mic._stream.push(256)
            time.sleep(0.0005)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()

    frames = []
    for _ in range(5):
        frames.append(np.asarray(mic.extract_frame_features()).ravel())
        time.sleep(0.005)   # let the producer get ahead between reads

    stop.set()
    thread.join(timeout=2)
    mic.stop_streaming()

    # Every frame is a clean contiguous ramp slice (no torn reads — the
    # lock prevents observing a half-rolled buffer) and, with the producer
    # running throughout, the stream makes forward progress overall
    starts = [f[0] for f in frames]
    for f in frames:
        np.testing.assert_array_equal(np.diff(f), 1.0)
    assert all(b >= a for a, b in zip(starts, starts[1:]))
    assert starts[-1] > starts[0]


def test_enter_stop_listener(fake_sd, monkeypatch):
    events = {}

    class FakeKey:
        enter = 'ENTER'

    class FakeListener:
        def __init__(self, on_press):
            self.on_press = on_press
            events['listener'] = self
            self.daemon = False

        def start(self):
            events['started'] = True

    class FakeKeyboard:
        Key = FakeKey
        Listener = FakeListener

    monkeypatch.setattr(stream_mod, 'keyboard', FakeKeyboard)
    monkeypatch.setattr(stream_mod, '_HAVE_PYNPUT', True)

    mic = stream_mod.MicrophoneStream(_module(), enter_to_stop=True)
    mic.start_streaming()
    assert events.get('started')
    assert not mic.query_finished()

    # Non-enter key: keep running; enter: stop and detach the listener
    assert events['listener'].on_press('x') is not False
    assert not mic.query_finished()
    assert events['listener'].on_press(FakeKey.enter) is False
    assert mic.query_finished()

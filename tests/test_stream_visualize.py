"""Tests for feature streaming and visualization (headless)."""

import matplotlib

matplotlib.use('Agg')

import numpy as np
import pytest

from amt_tools_tpu import tools
from amt_tools_tpu.features import MelSpec, AudioStream, AudioFileStream
from amt_tools_tpu.features.stream import FeatureStream
from amt_tools_tpu.tools import visualize as viz


@pytest.fixture(scope='module')
def module():
    return MelSpec(sample_rate=16000, hop_length=512, n_mels=32)


def _tone(fs=16000, dur=1.0):
    t = np.arange(int(fs * dur)) / fs
    return (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)


def test_audio_stream_frames(module):
    audio = _tone()
    stream = AudioStream(module, frame_buffer_size=3, audio=audio)

    stream.start_streaming()
    assert stream.query_active()
    assert not stream.query_finished()

    # Prime with empty frames, then extract real ones
    stream.prime_frame_buffer(3)
    features = stream.buffer_new_frame()

    assert features[tools.KEY_FEATS].shape == (1, 1, 32, 3)
    assert features[tools.KEY_TIMES].shape == (1, 1)

    stream.stop_streaming()
    assert not stream.query_active()


def test_audio_stream_consumes_all(module):
    audio = _tone(dur=0.3)
    stream = AudioStream(module, audio=audio)
    stream.start_streaming()

    count = 0
    while not stream.query_finished():
        frame = stream.extract_frame_features()
        if frame is None:
            break
        count += 1

    # One frame per hop across the audio
    assert count >= len(audio) // 512


def test_audio_file_stream(module, tmp_path):
    audio = _tone(dur=0.5)
    path = str(tmp_path / 'stream.wav')
    tools.write_wav(path, audio, 16000)

    stream = AudioFileStream(module, audio_path=path)
    stream.start_streaming()
    frame = stream.extract_frame_features()
    assert frame is not None and frame.shape[1] == 32
    stream.stop_streaming()


def test_stream_buffer_rolls(module):
    stream = AudioStream(module, frame_buffer_size=2, audio=_tone())
    stream.start_streaming()

    stream.buffer_empty_frame()
    stream.buffer_empty_frame()
    out = stream.buffer_new_frame()
    # Buffer keeps only the most recent frames
    assert out[tools.KEY_FEATS].shape[-1] == 2


def test_microphone_stream_unavailable(module):
    from amt_tools_tpu.features import MicrophoneStream
    from amt_tools_tpu.features import stream as stream_mod

    if not stream_mod._HAVE_SOUNDDEVICE:
        with pytest.raises(RuntimeError, match='sounddevice'):
            MicrophoneStream(module)


##################################################
# Visualization                                  #
##################################################


def test_static_plotters(tmp_path):
    fs = 16000
    audio = _tone(dur=0.2)
    times = np.arange(len(audio)) / fs

    fig = viz.plot_waveform(audio, times)
    fig.savefig(tmp_path / 'wave.png')

    tfr = np.random.rand(32, 50)
    fig = viz.plot_tfr(tfr, np.arange(50) * 0.032)
    fig.savefig(tmp_path / 'tfr.png')

    profile = tools.PianoProfile()
    mp = np.zeros((88, 50))
    mp[30, 10:30] = 1
    fig = viz.plot_pianoroll(mp, np.arange(50) * 0.032, profile)
    fig.savefig(tmp_path / 'roll.png')

    fig = viz.plot_notes(np.array([60.0, 64.0]),
                         np.array([[0.1, 0.5], [0.6, 1.0]]))
    fig.savefig(tmp_path / 'notes.png')

    tabs = np.full((6, 20), -1)
    tabs[0, 5:10] = 3
    fig = viz.plot_guitar_tablature(tabs, np.arange(20) * 0.023)
    fig.savefig(tmp_path / 'tabs.png')

    pitch_list = [np.array([60.0])] * 10
    fig = viz.plot_pitch_list(np.arange(10) * 0.032, pitch_list)
    fig.savefig(tmp_path / 'pl.png')

    stacked = {'E': (np.arange(10) * 0.032, pitch_list)}
    fig = viz.plot_stacked_pitch_list(stacked)
    fig.savefig(tmp_path / 'spl.png')

    assert all((tmp_path / n).exists() for n in
               ['wave.png', 'tfr.png', 'roll.png', 'notes.png', 'tabs.png',
                'pl.png', 'spl.png'])


def test_iterative_visualizers():
    wv = viz.WaveformVisualizer(sample_rate=16000, buffer_size=1600,
                                plot_frequency=2)
    # First update (counter 1): throttled; second: draws
    wv.update(np.zeros(160))
    assert wv.fig is None
    wv.update(np.ones(160))
    assert wv.fig is not None
    wv.close()

    tv = viz.TFRVisualizer(num_bins=32, buffer_size=20)
    tv.update(np.random.rand(32, 5))
    assert tv.buffer.shape == (32, 20)
    tv.close()

    gv = viz.GuitarTablatureVisualizer(buffer_size=20)
    gv.update(np.full((6, 3), 2))
    assert gv.buffer[:, -1].tolist() == [2] * 6
    gv.close()

    pv = viz.PianorollVisualizer(buffer_size=20)
    pv.update(np.ones((88, 4)))
    assert pv.buffer[:, -1].sum() == 88
    pv.close()

    sv = viz.StackedPitchListVisualizer(time_window=1.0)
    sv.update({'0': (np.arange(5) * 0.1, [np.array([440.0])] * 5)})
    sv.close()

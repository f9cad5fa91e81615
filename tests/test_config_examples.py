"""Tests for the experiment/config system and the example scripts."""

import importlib.util
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from amt_tools_tpu.config import Experiment

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_experiment_config_capture(tmp_path):
    ex = Experiment('test_ex', root_dir=str(tmp_path))

    @ex.config
    def config():
        learning_rate = 1e-3
        batch_size = 8
        name = 'hello'

    resolved = ex.resolve_config()
    assert resolved == {'learning_rate': 1e-3, 'batch_size': 8, 'name': 'hello'}

    # Overrides parse as JSON with string fallback
    resolved = ex.resolve_config(['learning_rate=0.01', 'name=world'])
    assert resolved['learning_rate'] == 0.01
    assert resolved['name'] == 'world'

    with pytest.raises(KeyError):
        ex.resolve_config(['unknown=1'])


def test_experiment_run_tracking(tmp_path):
    ex = Experiment('test_run', root_dir=str(tmp_path))

    @ex.config
    def config():
        value = 42

    captured = {}

    def main(value, root_dir):
        captured['value'] = value
        captured['root_dir'] = root_dir
        print('hello from main')
        ex.log_scalar('metric', 1.5, step=3)

    ex._main_fn = main
    ex.run()

    assert captured['value'] == 42
    run_dir = captured['root_dir']
    assert os.path.isdir(run_dir)

    with open(os.path.join(run_dir, 'config.json')) as f:
        assert json.load(f)['value'] == 42
    with open(os.path.join(run_dir, 'metrics.json')) as f:
        metrics = json.load(f)
        assert metrics['metric']['values'] == [1.5]
        assert metrics['metric']['steps'] == [3]
    # Console output captured
    assert 'hello from main' in open(os.path.join(run_dir, 'cout.txt')).read()

    # Second run gets the next numbered directory
    ex.run()
    assert os.path.isdir(os.path.join(str(tmp_path), '2'))


def _load_script(path):
    """Import a script module without triggering automain."""

    spec = importlib.util.spec_from_file_location('example_script', path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


@pytest.mark.parametrize('script', ['tabcnn.py', 'of_1.py', 'of_2.py'])
def test_example_scripts_configs_resolve(script):
    """The paper scripts must import cleanly and expose the paper recipes."""

    module = _load_script(os.path.join(REPO, 'examples', 'papers', script))

    config = module.ex.resolve_config()

    # Spot-check the paper hyperparameters
    if script == 'tabcnn.py':
        assert config['sample_rate'] == 22050
        assert config['num_frames'] == 200
        assert config['batch_size'] == 30
        assert config['iterations'] == 2500
    else:
        assert config['sample_rate'] == 16000
        assert config['num_frames'] == 625
        assert config['batch_size'] == 8
        assert config['learning_rate'] == 6e-4


def test_transcribe_file_script(tmp_path):
    """End-to-end smoke run of the offline transcription example."""

    from amt_tools_tpu import tools

    fs = 16000
    t = np.arange(fs) / fs
    audio = (0.4 * np.sin(2 * np.pi * 261.63 * t)).astype(np.float32)
    wav_path = str(tmp_path / 'clip.wav')
    tools.write_wav(wav_path, audio, fs)

    module = _load_script(os.path.join(REPO, 'examples', 'inference',
                                       'transcribe_file.py'))

    out_path = str(tmp_path / 'notes.txt')
    module.main(wav_path, None, out_path)

    assert os.path.exists(out_path)


def test_serve_batch_script_config_resolves():
    """The serving example imports cleanly and exposes its config."""

    module = _load_script(os.path.join(REPO, 'examples', 'inference',
                                       'serve_batch.py'))

    config = module.ex.resolve_config()
    assert config['batch_size'] == 16
    assert config['clip_seconds'] == 20
    assert config['capacity'] == 1024
    assert config['data_parallel'] is False

    overridden = module.ex.resolve_config(['batch_size=4',
                                           'data_parallel=true'])
    assert overridden['batch_size'] == 4
    assert overridden['data_parallel'] is True

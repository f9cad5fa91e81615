"""Offline transcription of an audio file: WAV in, notes out.

Usage::

    python transcribe_file.py input.wav [checkpoint_dir] [output.txt]

Loads the audio, extracts Mel features, runs Onsets & Frames (restoring the
latest checkpoint from ``checkpoint_dir`` if given, else random weights for
a smoke run), decodes notes, and writes them as ``onset offset pitch`` lines.
"""

import os
import sys

# Runnable without installation: resolve the repo root
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))

import sys

import numpy as np
import jax

from amt_tools_tpu import tools
from amt_tools_tpu.features import MelSpec
from amt_tools_tpu.models import OnsetsFrames2
from amt_tools_tpu.transcribe import ComboEstimator, NoteTranscriber
from amt_tools_tpu.inference import run_offline
from amt_tools_tpu.train import latest_checkpoint, load_checkpoint, init_state


def main(wav_path, checkpoint_dir=None, out_path='notes.txt'):
    sample_rate, hop_length = 16000, 512

    profile = tools.PianoProfile()
    data_proc = MelSpec(sample_rate=sample_rate, hop_length=hop_length, n_mels=229)

    print(f'Loading {wav_path}...')
    audio, _ = tools.load_normalize_audio(wav_path, fs=sample_rate, norm=-1)

    feats = data_proc.process_audio(audio)
    times = data_proc.get_times(audio)

    model = OnsetsFrames2(dim_in=229, profile=profile, model_complexity=3)

    # Initialize parameters (shapes only), then restore a checkpoint if given
    import optax
    example = {tools.KEY_FEATS: feats[None].astype(np.float32)}
    state = init_state(model, optax.adam(1e-3), example,
                       rng=jax.random.PRNGKey(0))

    if checkpoint_dir is not None:
        path, iteration = latest_checkpoint(checkpoint_dir)
        if path is None:
            raise FileNotFoundError(f'No checkpoint under {checkpoint_dir}')
        print(f'Restoring checkpoint at iteration {iteration}...')
        state = load_checkpoint(path, jax.device_get(state))

    estimator = ComboEstimator([NoteTranscriber(profile=profile)])

    track = {tools.KEY_FEATS: feats, tools.KEY_TIMES: times,
             tools.KEY_TRACK: 'input'}

    print('Transcribing...')
    predictions = run_offline(track, model, state.variables(), estimator)

    batched_notes = predictions[tools.KEY_NOTES]
    pitches, intervals = tools.batched_notes_to_notes(batched_notes)

    tools.write_notes(pitches, intervals, out_path)
    print(f'{len(pitches)} notes written to {out_path}')


if __name__ == '__main__':
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(1)
    main(*sys.argv[1:4])

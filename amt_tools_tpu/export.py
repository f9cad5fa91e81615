"""AOT deployment artifacts for the serving pipeline (``jax.export``).

A :class:`TranscriptionPipeline` is a live Python object: it needs the
model code, flax, and the feature modules importable to serve. This module
freezes one into a **self-contained artifact** — the StableHLO module with
the trained weights baked in as constants, plus the small host-side
metadata (frame-time grid, pitch offset, decode capacity) needed to turn
the device note buffers into ``(pitches, intervals)`` — so serving hosts
need jax + this package's host-side numpy (no flax tracing, no model
code, no feature modules: the device computation is already frozen).

The reference has no deployment story (its inference requires the full
torch model zoo importable, ``amt_tools/inference.py:12-47``); this is a
beyond-parity subsystem enabled by XLA's compilation model: the entire
audio -> features -> forward -> threshold -> note-decode graph is one
traced function, so one ``jax.export`` call captures the whole pipeline.

Batch-size handling: the artifact is exported with a SYMBOLIC batch
dimension when the lowering supports it (pure XLA path), so one artifact
serves any batch size; if the pipeline contains Pallas custom calls whose
lowering needs concrete shapes, export falls back to the concrete batch
size it was built with (recorded in the metadata).
"""

import io
import json
import warnings
import zipfile

import numpy as np

__all__ = ['export_serving', 'save_serving', 'load_serving',
           'ServingArtifact', 'export_streaming', 'load_streaming',
           'StreamingArtifact']

_META_NAME = 'meta.json'
_TIMES_NAME = 'times.npy'
_MODULE_NAME = 'module.bin'
_INIT_NAME = 'init.bin'


def export_serving(pipeline, num_samples, batch_size=8, platforms=None):
    """Freeze a :class:`~amt_tools_tpu.serving.TranscriptionPipeline`.

    Parameters
    ----------
    pipeline : TranscriptionPipeline
        The live pipeline; its (trained) variables are baked into the
        artifact as constants.
    num_samples : int
        Clip length in samples (static: the decode shapes depend on it).
    batch_size : int
        Batch size used when the symbolic-batch export is unsupported by
        the lowering (and as the example dimension when it is).
    platforms : sequence of str, optional
        Lowering platforms (e.g. ``('tpu',)`` or ``('cpu', 'tpu')``);
        defaults to the current backend.

    Returns
    -------
    bytes
        A zip container: serialized StableHLO module + host metadata.
    """

    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    if getattr(pipeline, 'mesh', None) is not None:
        raise ValueError('cannot export a mesh-sharded pipeline: the '
                         'artifact would bake in this host\'s device '
                         'topology. Export a single-device pipeline and '
                         'shard batches across loaded artifacts instead.')

    variables = pipeline.variables

    def serve(audio):
        return pipeline._pipeline(variables, audio)

    kwargs = {}
    if platforms is not None:
        kwargs['platforms'] = tuple(platforms)

    symbolic = True
    try:
        (b,) = jexport.symbolic_shape('b')
        spec = jax.ShapeDtypeStruct((b, num_samples), jnp.float32)
        exported = jexport.export(jax.jit(serve), **kwargs)(spec)
    except Exception as exc:  # Pallas custom calls etc.: concrete fallback
        symbolic = False
        spec = jax.ShapeDtypeStruct((batch_size, num_samples), jnp.float32)
        # If this ALSO fails, the problem is the pipeline itself, not shape
        # polymorphism — let that error surface with its own traceback
        exported = jexport.export(jax.jit(serve), **kwargs)(spec)
        warnings.warn(f'symbolic-batch export unavailable ({exc}); '
                      f'exported at fixed batch {batch_size}')

    times = np.asarray(pipeline._times_for(num_samples), dtype=np.float64)
    hop = float(times[1] - times[0]) if len(times) > 1 else 0.0

    meta = {
        'format_version': 1,
        'kind': 'serving',
        'num_samples': int(num_samples),
        'symbolic_batch': symbolic,
        'batch_size': None if symbolic else int(batch_size),
        'capacity': int(pipeline.capacity),
        'profile_low': int(pipeline.profile.low),
        'profile_high': int(pipeline.profile.high),
        'hop_seconds': hop,
        'platforms': list(exported.platforms),
    }

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, 'w', zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(_META_NAME, json.dumps(meta, indent=1))
        times_io = io.BytesIO()
        np.save(times_io, times)
        zf.writestr(_TIMES_NAME, times_io.getvalue())
        zf.writestr(_MODULE_NAME, exported.serialize())

    return buf.getvalue()


def save_serving(path, pipeline, num_samples, **kwargs):
    """``export_serving`` straight to a file; returns the metadata dict."""

    data = export_serving(pipeline, num_samples, **kwargs)
    with open(path, 'wb') as handle:
        handle.write(data)

    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        return json.loads(zf.read(_META_NAME))


class ServingArtifact:
    """A loaded deployment artifact: ``(B, N) audio -> per-clip notes``.

    Host-side requirements: jax + numpy only. The device computation is
    the deserialized StableHLO module (weights are constants inside it);
    :meth:`finalize` is plain numpy over the O(capacity) note buffers.
    """

    def __init__(self, meta, times, exported):
        self.meta = meta
        self.times = times
        self._exported = exported

    @property
    def num_samples(self):
        return self.meta['num_samples']

    def __call__(self, audio):
        import jax.numpy as jnp

        audio = jnp.asarray(audio, dtype=jnp.float32)
        if audio.ndim == 1:
            audio = audio[None]

        if audio.shape[-1] != self.num_samples:
            raise ValueError(f'artifact expects clips of '
                             f'{self.num_samples} samples, got '
                             f'{audio.shape[-1]}')
        fixed = self.meta['batch_size']
        if fixed is not None and audio.shape[0] != fixed:
            raise ValueError(f'artifact was exported at fixed batch size '
                             f'{fixed}, got {audio.shape[0]}')

        buffers = self._exported.call(audio)

        return self.finalize(buffers)

    def finalize(self, buffers):
        """Device note buffers -> list of (pitches, intervals) per clip.

        Delegates to the one canonical buffer decoder
        (``ops.decode.notes_from_device``) so the artifact path can never
        drift from the live pipeline's; overflow past the frozen capacity
        warns and truncates (re-export with a larger ``capacity`` for
        denser material — the live ``TranscriptionPipeline`` re-decodes
        instead, but an artifact's capacity is fixed at export time).
        """

        from .ops import decode
        from .tools.instrument import InstrumentProfile

        profile = InstrumentProfile(self.meta['profile_low'],
                                    self.meta['profile_high'])
        rows, on, off, counts = (np.asarray(b) for b in buffers)

        return [decode.notes_from_device(rows[b], on[b], off[b], counts[b],
                                         self.times, profile)
                for b in range(rows.shape[0])]


def load_serving(path_or_bytes):
    """Load an artifact produced by :func:`export_serving`."""

    from jax import export as jexport

    data = _read(path_or_bytes)
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        meta = json.loads(zf.read(_META_NAME))
        times = np.load(io.BytesIO(zf.read(_TIMES_NAME)))
        exported = jexport.deserialize(zf.read(_MODULE_NAME))

    return ServingArtifact(meta, times, exported)


def _read(path_or_bytes):
    if isinstance(path_or_bytes, (bytes, bytearray)):
        return bytes(path_or_bytes)

    with open(path_or_bytes, 'rb') as handle:
        return handle.read()


def export_streaming(model, variables, batch_size=1, frames_per_chunk=1,
                     platforms=None):
    """Freeze a carry-threading streaming model's step into an artifact.

    For models with the ``init_carries`` / ``__call__(feats, carries=...)``
    streaming contract (e.g. ``OnsetsFramesOnline``): exports TWO
    StableHLO modules — a zero-argument carry initializer and the
    per-chunk step ``(carries, feats) -> (finalized outputs, carries)``
    with pre/post-processing baked in. Feature frames come from the
    client (its microphone/file stream already owns the sample
    buffering); the artifact owns everything from feature frames to
    thresholded activation maps.

    The frozen step is the same computation ``inference.run_online_stateful``
    drives live (reference semantics: ``amt_tools/inference.py:49-96``,
    frame loop with persistent model state).
    """

    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    if not hasattr(model, 'init_carries'):
        raise TypeError(f'{type(model).__name__} has no init_carries: '
                        f'only carry-threading streaming models can be '
                        f'exported with export_streaming')

    kwargs = {}
    if platforms is not None:
        kwargs['platforms'] = tuple(platforms)

    def init():
        return model.init_carries(batch_size)

    def step(carries, feats):
        from . import tools

        batch = model.pre_proc({tools.KEY_FEATS: feats})
        raw, new_carries = model.apply(variables, batch[tools.KEY_FEATS],
                                       carries=carries)
        out = model.post_proc({tools.KEY_OUTPUT: raw})

        return out, new_carries

    init_exported = jexport.export(jax.jit(init), **kwargs)()

    feats_spec = jax.ShapeDtypeStruct(
        (batch_size, model.in_channels, model.dim_in, frames_per_chunk),
        jnp.float32)
    carries_spec = jax.eval_shape(init)
    step_exported = jexport.export(jax.jit(step), **kwargs)(
        carries_spec, feats_spec)

    meta = {
        'format_version': 1,
        'kind': 'streaming',
        'batch_size': int(batch_size),
        'frames_per_chunk': int(frames_per_chunk),
        'dim_in': int(model.dim_in),
        'in_channels': int(model.in_channels),
        'profile_low': int(model.profile.low),
        'profile_high': int(model.profile.high),
        'platforms': list(step_exported.platforms),
    }

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, 'w', zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(_META_NAME, json.dumps(meta, indent=1))
        zf.writestr(_INIT_NAME, init_exported.serialize())
        zf.writestr(_MODULE_NAME, step_exported.serialize())

    return buf.getvalue()


class StreamingArtifact:
    """A loaded streaming artifact: feature chunks in, activation maps out.

    Usage::

        art = load_streaming('online.amtx')
        carries = art.init_carries()
        for chunk in feature_frames:          # (B, C, F, W) each
            outputs, carries = art.step(carries, chunk)
    """

    def __init__(self, meta, init_exported, step_exported):
        self.meta = meta
        self._init = init_exported
        self._step = step_exported

    def init_carries(self):
        return self._init.call()

    def step(self, carries, feats):
        import jax.numpy as jnp

        feats = jnp.asarray(feats, dtype=jnp.float32)
        expected = (self.meta['batch_size'], self.meta['in_channels'],
                    self.meta['dim_in'], self.meta['frames_per_chunk'])
        if tuple(feats.shape) != expected:
            raise ValueError(f'artifact expects feature chunks of shape '
                             f'{expected}, got {tuple(feats.shape)}')

        return self._step.call(carries, feats)


def load_streaming(path_or_bytes):
    """Load an artifact produced by :func:`export_streaming`."""

    from jax import export as jexport

    data = _read(path_or_bytes)
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        meta = json.loads(zf.read(_META_NAME))
        init_exported = jexport.deserialize(zf.read(_INIT_NAME))
        step_exported = jexport.deserialize(zf.read(_MODULE_NAME))

    return StreamingArtifact(meta, init_exported, step_exported)

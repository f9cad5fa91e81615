"""Production serving: one jitted graph from audio batch to note buffers.

TPU-native capability with no reference counterpart (the reference's
inference is per-track host-loop numpy, ``amt_tools/inference.py:12-47``):
a :class:`TranscriptionPipeline` compiles feature extraction, the model
forward, activation thresholding, and the FULL note decode
(``ops.decode.notes_on_device``) into a single XLA executable. The host
receives fixed-capacity compact note buffers — O(capacity) transfer,
O(notes) finalization — so the serving loop's host work is negligible and
dispatch n+1 overlaps batch n's finalization (JAX async dispatch).

This is the pipeline behind ``bench.py``'s headline number (~16,000x
real time per v5e chip).
"""

import numpy as np

from . import tools
from .ops import decode

__all__ = ['TranscriptionPipeline', 'calibrate_activity',
           'calibrate_quant_stats']


def calibrate_quant_stats(model, variables, data_proc, audio_batches):
    """Fill the ``'quant_stats'`` collection for static int8 serving.

    A model built with ``quant_acoustic='static'`` reads one calibrated
    activation scale per quantized layer from the ``'quant_stats'``
    variable collection (``ops/qconv.py``). This runs the forward on one
    or more representative audio batches with that collection mutable —
    each Int8Conv/Int8Dense records the running abs-max it saw — and
    returns a new variables dict including the filled collection.

    Activations louder than the calibrated range saturate at the int8
    limit, so calibrate on audio at the loudness you serve (the standard
    normalization makes this easy to satisfy).
    """

    import jax

    from .ops.qconv import QUANT_STATS

    if not isinstance(audio_batches, (list, tuple)):
        audio_batches = [audio_batches]

    @jax.jit
    def probe(variables, audio):
        feats = data_proc.process_jax(audio)
        batch = model.pre_proc({tools.KEY_FEATS: feats})
        _, mutated = model.apply(variables, batch[tools.KEY_FEATS],
                                 train=False, mutable=[QUANT_STATS])
        return mutated[QUANT_STATS]

    out = dict(variables)
    for audio in audio_batches:
        # Running max: each pass folds its batch's abs-maxima into the
        # stats the next pass starts from
        out[QUANT_STATS] = probe(out, audio)

    return out


def calibrate_activity(model, variables, data_proc, audio,
                       rates=((tools.KEY_MULTIPITCH, 'adjoin_out', 0.03),
                              (tools.KEY_ONSETS, 'onset_out', 0.001))):
    """Shift output-head biases so activation rates match a trained model.

    Demo/benchmark utility: with random weights the sparse-activity bias
    prior keeps every output silent, so a serving pipeline would decode
    empty maps. This runs one forward pass on a probe batch, measures each
    head's logit quantile, and subtracts it from that head's Dense bias so
    the requested fraction of cells clears the 0.5 sigmoid threshold —
    decode cost then reflects trained-model-like activity.

    ``rates``: (output key, head module name, target activation rate)
    triples. Returns a new variables dict (inputs unmodified).
    """

    import jax
    import jax.numpy as jnp

    @jax.jit
    def probe(variables, audio):
        feats = data_proc.process_jax(audio)
        batch = model.pre_proc({tools.KEY_FEATS: feats})
        raw = model.apply(variables, batch[tools.KEY_FEATS], train=False)
        return {head: jnp.quantile(raw[key], 1.0 - rate)
                for key, head, rate in rates}

    shifts = probe(variables, audio)

    params = jax.tree_util.tree_map(lambda x: x, variables['params'])
    for _, head, _ in rates:
        # Mutate only the bias in a copied subtree — rebuilding the head as
        # {'Dense_0': ...} would silently drop any sibling leaves if the
        # head ever gains another parameterized layer
        head_tree = dict(params[head])
        dense = dict(head_tree['Dense_0'])
        dense['bias'] = dense['bias'] - shifts[head]
        head_tree['Dense_0'] = dense
        params[head] = head_tree

    out = dict(variables)
    out['params'] = params
    return out


class TranscriptionPipeline:
    """Audio batches in, per-clip ``(pitches, intervals)`` notes out.

    Parameters
    ----------
    model : TranscriptionModel
        A model whose finalized outputs include multi-pitch (and optionally
        onset) activation maps, e.g. ``OnsetsFrames2``.
    variables : dict
        Trained flax variables for the model.
    data_proc : FeatureModule
        Feature extraction run in-graph via ``process_jax``.
    capacity : int
        Maximum notes decoded per clip (overflow warns and truncates).
    threshold : float
        Sigmoid threshold for activation maps.
    use_onsets : bool
        Gate note starts with the model's onset head when available.
    mesh : jax.sharding.Mesh, optional
        Data-parallel serving: clips shard over the mesh's ``data`` axis
        (batch must be divisible by it), parameters replicate, and XLA runs
        the whole pipeline SPMD across the chips.
    """

    def __init__(self, model, variables, data_proc, capacity=2048,
                 threshold=0.5, use_onsets=True, mesh=None):
        import jax
        import jax.numpy as jnp

        self.model = model
        self.variables = variables
        self.data_proc = data_proc
        self.capacity = capacity
        self.profile = model.profile
        self.mesh = mesh

        if getattr(model, 'quant_acoustic', False) == 'static':
            # Fail loudly here (variables are concrete) — serving with
            # zeros-init quant stats would silently decode garbage
            from .ops.qconv import validate_quant_stats
            validate_quant_stats(variables, 'TranscriptionPipeline')

        if mesh is not None:
            from .parallel import replicate
            self.variables = replicate(self.variables, mesh)

        def make_pipeline(cap):
            def pipeline(variables, audio):
                feats = data_proc.process_jax(audio)
                batch = model.pre_proc({tools.KEY_FEATS: feats})
                raw = model.apply(variables, batch[tools.KEY_FEATS],
                                  train=False)

                multi_pitch = decode.threshold(
                    jax.nn.sigmoid(jnp.swapaxes(raw[tools.KEY_MULTIPITCH],
                                                -1, -2)), threshold)

                onsets = None
                if use_onsets and tools.KEY_ONSETS in raw:
                    onsets = decode.threshold(
                        jax.nn.sigmoid(jnp.swapaxes(raw[tools.KEY_ONSETS],
                                                    -1, -2)), threshold)

                return jax.vmap(
                    lambda m, o: decode.notes_on_device(m, o, capacity=cap)
                )(multi_pitch, onsets)

            return jax.jit(pipeline)

        self._make_pipeline = make_pipeline
        self._pipelines = {capacity: make_pipeline(capacity)}
        self._pipeline = self._pipelines[capacity]
        self._times_cache = {}

    def _pipeline_for(self, capacity):
        """Jitted pipeline at a given decode capacity (compiled lazily)."""

        if capacity not in self._pipelines:
            self._pipelines[capacity] = self._make_pipeline(capacity)

        return self._pipelines[capacity]

    def _times_for(self, num_samples):
        """Frame times depend only on the clip length; cache per length.

        Bounded (LRU-ish): long-running servers fed arbitrary-length clips
        must not accumulate one entry per length ever seen.
        """

        if num_samples not in self._times_cache:
            if len(self._times_cache) >= 16:
                self._times_cache.pop(next(iter(self._times_cache)))
            self._times_cache[num_samples] = self.data_proc.get_times(
                np.zeros(num_samples, dtype=np.float32))

        return self._times_cache[num_samples]

    def dispatch(self, audio):
        """Start the device computation for one (B, N) audio batch.

        Returns an opaque handle (device buffers, dispatched asynchronously);
        pass it to :meth:`finalize`. Dispatch the next batch before
        finalizing the previous one to overlap host and device work;
        in-flight handles of different clip lengths are fine (each handle
        carries its own time grid).
        """

        import jax

        # Keep device-resident inputs on device: np.asarray on a jax.Array
        # would round-trip the whole batch through the host per dispatch
        if not isinstance(audio, jax.Array):
            audio = np.asarray(audio)
        if audio.ndim == 1:
            audio = audio[None]

        if self.mesh is not None:
            # device_put is a no-op when the input already carries this
            # sharding, reshards otherwise (replicated inputs would silently
            # make every chip compute the full batch); raises when the batch
            # does not divide the data axis
            from jax.sharding import NamedSharding, PartitionSpec
            audio = jax.device_put(
                audio, NamedSharding(self.mesh, PartitionSpec('data')))

        times = self._times_for(audio.shape[-1])

        return self._pipeline(self.variables, audio), times, audio

    def finalize(self, handle):
        """Block on a :meth:`dispatch` handle -> per-clip note groups.

        Clips whose true note count exceeds ``capacity`` are re-decoded at a
        sufficient capacity (the device reports the exact count, so one
        retry always completes) instead of warn-and-truncate — dense music
        never silently loses notes.
        """

        buffers, times, audio = handle
        rows, on, off, counts = (np.asarray(b) for b in buffers)

        groups = []
        for b in range(rows.shape[0]):
            count = int(counts[b])
            if count > self.capacity:
                groups.append(self._redecode_overflow(audio[b], count, times))
            else:
                groups.append(decode.notes_from_device(
                    rows[b], on[b], off[b], counts[b], times, self.profile))

        return groups

    def _redecode_overflow(self, clip, count, times):
        """Re-run one clip at a capacity that fits its true note count.

        Capacities round up to a multiple of 1024 (at least 2x the default)
        so retry recompiles stay rare and cached across clips.
        """

        capacity = max(2 * self.capacity, -(-count // 1024) * 1024)
        pipeline = self._pipeline_for(capacity)

        buffers = pipeline(self.variables, clip[None])
        rows, on, off, counts = (np.asarray(b) for b in buffers)

        return decode.notes_from_device(rows[0], on[0], off[0], counts[0],
                                        times, self.profile)

    def __call__(self, audio):
        """Synchronous convenience: dispatch + finalize one batch."""

        return self.finalize(self.dispatch(audio))

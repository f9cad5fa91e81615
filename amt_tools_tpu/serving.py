"""Production serving: one jitted graph from audio batch to note buffers.

TPU-native capability with no reference counterpart (the reference's
inference is per-track host-loop numpy, ``amt_tools/inference.py:12-47``):
a :class:`TranscriptionPipeline` compiles feature extraction, the model
forward, activation thresholding, and the FULL note decode
(``ops.decode.notes_on_device``) into a single XLA executable. The host
receives fixed-capacity compact note buffers — O(capacity) transfer,
O(notes) finalization — so the serving loop's host work is negligible and
dispatch n+1 overlaps batch n's finalization (JAX async dispatch).

:class:`TablaturePipeline` is the guitar-flagship counterpart: audio ->
CQT -> TabCNN -> on-device tablature -> stacked multi-pitch -> per-string
note decode, reproducing the reference estimator chain TablatureWrapper ->
StackedNoteTranscriber (``amt_tools/transcribe.py:1097-1145`` and
``:373-513``) inside one executable.

These pipelines are behind ``bench.py``'s headline numbers (~24,000x
real time per v5e chip for O&F2).
"""

import numpy as np

from . import tools
from .ops import decode

__all__ = ['TranscriptionPipeline', 'TablaturePipeline',
           'calibrate_activity', 'calibrate_tablature_activity',
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


def calibrate_tablature_activity(model, variables, data_proc, audio,
                                 rate=0.05):
    """Shift the silence-class biases so string activity is trained-like.

    Demo/benchmark utility, the :class:`TablaturePipeline` counterpart of
    :func:`calibrate_activity`: an untrained ``SoftmaxGroups`` head argmaxes
    to an arbitrary class per (string, frame), producing absurdly dense
    tablature. This probes one forward pass, measures per string the margin
    between the best non-silence logit and the silence logit, and RAISES the
    silence-class bias to the margin's ``1 - rate`` quantile — so roughly
    ``rate`` of (string, frame) cells decode to a fret, matching a trained
    model's duty cycle (~5% per string on GuitarSet-style material).
    """

    import jax
    import jax.numpy as jnp

    num_groups = model.num_groups
    num_classes = model.num_classes

    @jax.jit
    def probe(variables, audio):
        feats = data_proc.process_jax(audio)
        batch = model.pre_proc({tools.KEY_FEATS: feats})
        raw = model.apply(variables, batch[tools.KEY_FEATS], train=False)

        logits = raw[tools.KEY_TABLATURE]
        logits = logits.reshape(logits.shape[:-1] + (num_groups, num_classes))
        # Margin of the best fret over silence (last class), per string
        margin = (jnp.max(logits[..., :-1], axis=-1) - logits[..., -1])

        return jnp.quantile(margin.reshape(-1, num_groups), 1.0 - rate,
                            axis=0)

    shifts = probe(variables, audio)

    params = jax.tree_util.tree_map(lambda x: x, variables['params'])
    head_tree = dict(params['tablature_out'])
    dense = dict(head_tree['Dense_0'])
    bias = np.asarray(dense['bias']).copy()
    silence_idx = np.arange(num_groups) * num_classes + (num_classes - 1)
    bias[silence_idx] = bias[silence_idx] + np.asarray(shifts)
    dense['bias'] = jnp.asarray(bias)
    head_tree['Dense_0'] = dense
    params['tablature_out'] = head_tree

    out = dict(variables)
    out['params'] = params
    return out


class _ServingPipeline:
    """Shared serving machinery: jitted-graph cache by decode capacity,
    mesh replication, quant-stats validation, frame-time cache, and the
    async dispatch/finalize protocol. Subclasses provide
    ``_build_pipeline(capacity)`` (the jittable device function) and
    ``_finalize_clip`` (host decode of one clip's buffers; overflow
    re-decodes are handled here by ``finalize``/``_redecode_overflow``).
    """

    def __init__(self, model, variables, data_proc, capacity, mesh=None):
        self.model = model
        self.variables = variables
        self.data_proc = data_proc
        self.capacity = capacity
        self.profile = model.profile
        self.mesh = mesh

        if (getattr(model, 'quant_acoustic', False) == 'static'
                or getattr(model, 'quant_lm', False) == 'static'):
            # Fail loudly here (variables are concrete) — serving with
            # zeros-init quant stats would silently decode garbage
            from .ops.qconv import validate_quant_stats
            validate_quant_stats(variables, type(self).__name__)

        if mesh is not None:
            from .parallel import replicate
            self.variables = replicate(self.variables, mesh)
        else:
            # Pin the variables on device once: checkpoints restored from
            # npz/orbax arrive as HOST numpy trees, and a jitted call with
            # host operands re-uploads the whole parameter tree EVERY
            # dispatch (measured 8x pipeline slowdown through the axon
            # tunnel — ~2 s/batch of param upload for O&F2-c3)
            import jax
            self.variables = jax.device_put(self.variables)

        self._pipelines = {capacity: self._build_pipeline(capacity)}
        self._pipeline = self._pipelines[capacity]
        self._times_cache = {}

    def _build_pipeline(self, capacity):
        raise NotImplementedError

    def _pipeline_for(self, capacity):
        """Jitted pipeline at a given decode capacity (compiled lazily)."""

        if capacity not in self._pipelines:
            self._pipelines[capacity] = self._build_pipeline(capacity)

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
        """Block on a :meth:`dispatch` handle -> per-clip decoded notes.

        Clips whose true note count exceeds ``capacity`` are re-decoded at a
        sufficient capacity (the device reports the exact count, so one
        retry always completes) instead of warn-and-truncate — dense music
        never silently loses notes.
        """

        buffers, times, audio = handle
        arrays = tuple(np.asarray(b) for b in buffers)
        counts = arrays[-1]

        groups = []
        for b in range(counts.shape[0]):
            needed = int(np.max(counts[b]))
            if needed > self.capacity:
                groups.append(self._redecode_overflow(audio[b], needed, times))
            else:
                groups.append(self._finalize_clip(arrays, b, times))

        return groups

    def _redecode_overflow(self, clip, count, times):
        """Re-run one clip at a capacity that fits its true note count.

        Capacities round up to a multiple of 1024 (at least 2x the default)
        so retry recompiles stay rare and cached across clips.
        """

        capacity = max(2 * self.capacity, -(-count // 1024) * 1024)
        pipeline = self._pipeline_for(capacity)

        buffers = pipeline(self.variables, clip[None])
        arrays = tuple(np.asarray(b) for b in buffers)

        return self._finalize_clip(arrays, 0, times)

    def _finalize_clip(self, arrays, b, times):
        raise NotImplementedError

    def __call__(self, audio):
        """Synchronous convenience: dispatch + finalize one batch."""

        return self.finalize(self.dispatch(audio))


class TranscriptionPipeline(_ServingPipeline):
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
        Maximum notes decoded per clip before a re-decode retry.
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
        self.threshold = threshold
        self.use_onsets = use_onsets
        super().__init__(model, variables, data_proc, capacity, mesh=mesh)

    def _build_pipeline(self, cap):
        import jax
        import jax.numpy as jnp

        model, data_proc = self.model, self.data_proc
        threshold, use_onsets = self.threshold, self.use_onsets

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

    def _finalize_clip(self, arrays, b, times):
        rows, on, off, counts = arrays

        return decode.notes_from_device(rows[b], on[b], off[b], counts[b],
                                        times, self.profile)


class TablaturePipeline(_ServingPipeline):
    """Audio batches in, per-clip stacked notes (slice -> notes) out.

    The guitar-flagship serving path: one XLA executable runs CQT feature
    extraction, the TabCNN forward, per-string softmax decoding to
    tablature class ids, expansion to stacked multi-pitch, and the
    per-string note decode (``ops.decode.notes_on_device`` vmapped over
    batch and string). Semantics per clip match the reference estimator
    chain ``TablatureWrapper -> StackedNoteTranscriber`` with default
    options (``amt_tools/transcribe.py:1097-1145``, ``:373-513``): onsets
    are derived from pitch-activity edges, no inhibition window, no
    duration filter.

    Parameters
    ----------
    model : TabCNN
        A model whose raw output carries ``KEY_TABLATURE`` logits decoded
        by a ``SoftmaxGroups`` head (last class = silence).
    capacity : int
        Maximum notes decoded per STRING per clip before a re-decode
        retry (strings decode independently into fixed-size buffers).
    """

    def __init__(self, model, variables, data_proc, capacity=512, mesh=None):
        self._decode_fns = {}
        super().__init__(model, variables, data_proc, capacity, mesh=mesh)

    def _decode_fn_for(self, cap):
        """Jitted decode stage: (B, S, T) tablature class ids -> buffers.

        Decodes in LOCAL fret space (rows = fret classes) rather than the
        instrument's absolute pitch range — on a standard guitar that is
        20 rows per string instead of 44, roughly halving the note
        decode's work (measured 70.8 -> ~35 ms at the serving config).
        ``_finalize_clip`` maps rows back to MIDI with the string tuning;
        the decoded notes are identical.
        """

        if cap not in self._decode_fns:
            import jax

            num_classes = self.model.num_classes - 1  # drop silence class

            def decode_stage(tablature):
                local = decode.tablature_to_local_multi_pitch(tablature,
                                                              num_classes)
                return jax.vmap(jax.vmap(
                    lambda m: decode.notes_on_device(m, None, capacity=cap)
                ))(local)

            self._decode_fns[cap] = jax.jit(decode_stage)

        return self._decode_fns[cap]

    def _build_pipeline(self, cap):
        import jax

        from .models.common import SoftmaxGroups

        model, data_proc = self.model, self.data_proc
        head = SoftmaxGroups(dim_in=0,
                             dim_out=model.num_groups * model.num_classes,
                             num_groups=model.num_groups,
                             num_classes=model.num_classes)
        decode_stage = self._decode_fn_for(cap)

        def pipeline(variables, audio):
            feats = data_proc.process_jax(audio)
            batch = model.pre_proc({tools.KEY_FEATS: feats})
            raw = model.apply(variables, batch[tools.KEY_FEATS],
                              train=False)

            # (B, T, G*C) logits -> (B, S, T) class ids -> note buffers
            tablature = head.finalize_output(raw[tools.KEY_TABLATURE])

            return decode_stage(tablature)

        return jax.jit(pipeline)

    def decode_tablature(self, tablature, times):
        """Decode pre-computed (B, S, T) tablature through the pipeline's
        device decode stages (the exact code the fused pipeline runs after
        the forward) -> per-clip stacked notes.

        Useful for serving pre-decoded predictions and for pinning the
        device decode to the host estimator-chain semantics in tests;
        overflowing clips re-decode at a sufficient capacity from the same
        tablature (no forward re-run).
        """

        import jax.numpy as jnp

        tablature = jnp.asarray(tablature)
        arrays = tuple(np.asarray(b)
                       for b in self._decode_fn_for(self.capacity)(tablature))
        counts = arrays[-1]

        groups = []
        for b in range(counts.shape[0]):
            needed = int(np.max(counts[b]))
            if needed > self.capacity:
                capacity = max(2 * self.capacity, -(-needed // 1024) * 1024)
                redone = tuple(np.asarray(x) for x in self._decode_fn_for(
                    capacity)(tablature[b][None]))
                groups.append(self._finalize_clip(redone, 0, times))
            else:
                groups.append(self._finalize_clip(arrays, b, times))

        return groups

    def _finalize_clip(self, arrays, b, times):
        rows, on, off, counts = arrays
        tuning = self.profile.get_midi_tuning()

        # Rows are LOCAL fret classes (see _decode_fn_for): row + the
        # string's open tuning is the MIDI pitch
        return {slc: decode.notes_from_device(
                    rows[b, slc], on[b, slc], off[b, slc], counts[b, slc],
                    times, self.profile, low=int(tuning[slc]))
                for slc in range(counts.shape[1])}

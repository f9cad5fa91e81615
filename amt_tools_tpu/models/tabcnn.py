"""TabCNN guitar tablature model in flax.

Re-design of the reference's ``amt_tools/models/tabcnn.py:11-221`` (ISMIR
2019). Key TPU fix: the reference framifies features on the host every batch
with a GPU -> numpy -> GPU round trip (``tabcnn.py:122-127``); here the
9-frame context windows are built inside the compiled graph
(``ops.frames.framify``) so the whole pre_proc -> forward path fuses under
``jit``. Convolutions run in NHWC with the context window and frequency as
the spatial dims.
"""

import jax.numpy as jnp
from flax import linen as nn

from .. import tools
from ..ops import frames as frame_ops
from ..ops.qconv import Int8Conv, Int8Dense
from .common import TranscriptionModel, SoftmaxGroups

__all__ = ['TabCNN']


class TabCNN(TranscriptionModel):
    """Per-frame context-window CNN with softmax-group tablature output.

    ``fullseq=True`` switches to a serving-mode forward that is EXACTLY
    equivalent to the per-window computation but never materializes the
    windows: because every conv is VALID (no intra-window padding), running
    the conv stack once over the whole (F, T) image yields, at output
    position t, precisely what window t computes — the per-window
    ``max_pool((2, 2), strides=(2, 2))`` over the 3 surviving window-time
    positions becomes a stride-1 kernel-2 pool over full-sequence time.
    The windowed graph peaks at O(B*T * F * W * C) conv activations (a
    40 GB fusion at the serving config, HBM-infeasible); fullseq peaks at
    O(B * F * T * C) — ``frame_width``-fold smaller. Parameter trees are
    identical, so trained variables swap between the modes freely.
    """

    frame_width: int = 9
    online: bool = False
    fullseq: bool = False

    @nn.nowrap
    def _check_fullseq_geometry(self):
        """Fullseq equivalence is proven only for the 9-frame windows.

        Three 3x3 VALID convs leave ``frame_width - 6`` surviving window-time
        positions; the stride-(2, 1) pool + trim reproduces the per-window
        (2, 2)/(2, 2) pool only when that count is 3 (frame_width == 9, the
        reference geometry). Other widths would fail later via an opaque
        dense1 parameter-shape mismatch — fail loudly here instead.
        """

        if self.frame_width != 9:
            raise ValueError(
                f'fullseq=True requires frame_width == 9 (the geometry whose '
                f'pool equivalence is established); got {self.frame_width}. '
                f'Use the windowed forward (fullseq=False) for other widths.')

    @property
    def num_groups(self):
        return self.profile.get_num_dofs()

    @property
    def num_classes(self):
        return self.profile.num_pitches + 1

    @nn.nowrap
    def pre_proc(self, batch):
        """Window features: (B, C, F, T) -> (B, T, F, W, C) context windows.

        In online mode incoming features already span exactly one window, so
        no padding is applied (reference ``tabcnn.py:89-98``). In fullseq
        mode no windows are built: features become one zero-padded
        (B, F, T + W - 1, C) NHWC image (the same zero center-padding
        ``framify`` applies, so edge windows match exactly).
        """

        batch = dict(batch)
        feats = jnp.asarray(batch[tools.KEY_FEATS])

        if self.fullseq:
            self._check_fullseq_geometry()
            pad = self.frame_width // 2
            # (B, C, F, T) -> (B, F, T + 2*pad, C)
            feats = jnp.pad(feats, ((0, 0), (0, 0), (0, 0), (pad, pad)))
            batch[tools.KEY_FEATS] = jnp.transpose(feats, (0, 2, 3, 1))
            return batch

        # (B, C, F, T) -> (B, C, F, T', W)
        feats = frame_ops.framify(feats, self.frame_width, pad=(not self.online))

        # -> (B, T', F, W, C): time-major windows in NHWC (F, W are spatial)
        feats = jnp.transpose(feats, (0, 3, 2, 4, 1))

        batch[tools.KEY_FEATS] = feats

        return batch

    def setup(self):
        nf1 = 32 * self.model_complexity
        nf2 = 64 * self.model_complexity

        if self.quant_acoustic:
            # Serving-only int8 MXU path; identical parameter tree (the
            # attribute names pin the checkpoint layout), see ops/qconv.py
            static = self.quant_acoustic == 'static'
            self.conv1 = Int8Conv(nf1, (3, 3), padding='VALID',
                                  dtype=self.dtype, static_scale=static)
            self.conv2 = Int8Conv(nf2, (3, 3), padding='VALID',
                                  dtype=self.dtype, static_scale=static)
            self.conv3 = Int8Conv(nf2, (3, 3), padding='VALID',
                                  dtype=self.dtype, static_scale=static)
            self.dense1 = Int8Dense(128 * self.model_complexity,
                                    dtype=self.dtype, static_scale=static)
        else:
            self.conv1 = nn.Conv(nf1, (3, 3), padding='VALID',
                                 dtype=self.dtype)
            self.conv2 = nn.Conv(nf2, (3, 3), padding='VALID',
                                 dtype=self.dtype)
            self.conv3 = nn.Conv(nf2, (3, 3), padding='VALID',
                                 dtype=self.dtype)
            self.dense1 = nn.Dense(128 * self.model_complexity,
                                   dtype=self.dtype)
        self.dropout1 = nn.Dropout(0.25)
        self.dropout2 = nn.Dropout(0.50)
        self.tablature_out = SoftmaxGroups(
            dim_in=128 * self.model_complexity,
            dim_out=self.num_groups * self.num_classes,
            num_groups=self.num_groups,
            num_classes=self.num_classes,
            dtype=self.dtype)

    def __call__(self, feats, train=False):
        """(B, T, F, W, C) windows -> dict with (B, T, G*C) tablature logits.

        In fullseq mode ``feats`` is the padded (B, F, T + W - 1, C) image
        from :meth:`pre_proc` and the logits are identical to the windowed
        path's (see class docstring for the equivalence argument).
        """

        output = {}

        if self.fullseq:
            self._check_fullseq_geometry()
            batch_size = feats.shape[0]
            num_frames = feats.shape[2] - (self.frame_width - 1)  # original T

            x = nn.relu(self.conv1(feats))
            x = nn.relu(self.conv2(x))
            x = nn.relu(self.conv3(x))
            # Per-window max_pool((2, 2), (2, 2)) over its 3 surviving time
            # positions keeps max(pos 0, pos 1) -> full-seq positions (t, t+1)
            x = nn.max_pool(x, (2, 2), strides=(2, 1))
            x = x[:, :, :num_frames, :]
            x = self.dropout1(x, deterministic=not (train and self.dropout))

            # Match the windowed flatten order (F-major, then channels)
            x = jnp.transpose(x, (0, 2, 1, 3))
            x = x.reshape((batch_size, num_frames, -1))
        else:
            batch_size, num_frames = feats.shape[0], feats.shape[1]

            # Collapse the window axis into the batch: each context window is
            # an independent sample through the conv stack
            x = feats.reshape((-1,) + feats.shape[2:])

            x = nn.relu(self.conv1(x))
            x = nn.relu(self.conv2(x))
            x = nn.relu(self.conv3(x))
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = self.dropout1(x, deterministic=not (train and self.dropout))

            # Flatten spatial features into one embedding per window
            x = x.reshape((batch_size, num_frames, -1))

        x = nn.relu(self.dense1(x))
        x = self.dropout2(x, deterministic=not (train and self.dropout))

        output[tools.KEY_TABLATURE] = self.tablature_out(x)

        return output

    @nn.nowrap
    def post_proc(self, batch):
        """Tablature CE loss and argmax decoding."""

        output = dict(batch[tools.KEY_OUTPUT])

        head = SoftmaxGroups(dim_in=128 * self.model_complexity,
                             dim_out=self.num_groups * self.num_classes,
                             num_groups=self.num_groups,
                             num_classes=self.num_classes)

        tablature_est = output[tools.KEY_TABLATURE]

        if tools.KEY_TABLATURE in batch:
            tablature_ref = batch[tools.KEY_TABLATURE]
            loss = head.get_loss(tablature_est, tablature_ref)
            output[tools.KEY_LOSS] = {tools.KEY_LOSS_TOTAL: loss}

        output[tools.KEY_TABLATURE] = head.finalize_output(tablature_est)

        return output

"""Executable recurrentshop shim: ``RecurrentModel`` readout decoding.

The reference's entire autoregressive decoder machinery is recurrentshop
(vae_definition.py:546, :594, :632, :670, :710). The library itself is not
in this image, so the decode-loop semantics here are SUPPLIED by the shim,
locked to this framework's documented interpretation (PARITY.md; the same
one midi_vae_tpu/models/rnn.py:225-297 implements):

  * decode=True: ``output_length`` steps are generated from a single start
    symbol; step 0 consumes ``initial_readout``, step t>0 consumes the
    previous step's OUTPUT (the post-Dense activation, i.e. probabilities),
  * teacher_force=True: step t>0 consumes ``ground_truth[:, t-1]`` instead,
  * per-step state flow: the cell sub-graph from (input, *initial_states)
    to (output, *final_states), evaluated with the running states.

What still executes from the reference: the step graph itself (which cells
exist, their sizes, the readout Dense + activation), the state-init Dense
wiring, and every dimension.

The star-export includes keras layers because the reference resolves
``Activation`` through ``from recurrentshop import *``
(vae_definition.py:6 -- Activation is missing from its keras.layers import
list at vae_definition.py:2).
"""

from __future__ import annotations

import numpy as np

# the shim directory is on sys.path whenever this package is importable
# (ref_parity_check.load_reference_module inserts it), so `keras` resolves
# to the sibling shim package
from keras.engine import Call, Layer, Node, evaluate  # noqa: E402
from keras.layers import (  # noqa: E402,F401
    Activation,
    Add,
    Bidirectional,
    Concatenate,
    Dense,
    Embedding,
    GRU,
    Input,
    Lambda,
    LSTM,
    SimpleRNN,
)


class RecurrentModel(Layer):
    def __init__(
        self,
        input=None,  # noqa: A002 - recurrentshop API name
        output=None,
        initial_states=None,
        final_states=None,
        readout_input=None,
        teacher_force=False,
        decode=False,
        output_length=None,
        return_states=False,
        state_initializer=None,
        name=None,
        **_kwargs,
    ):
        super().__init__(name=name)
        if not decode:
            raise NotImplementedError(
                "shim RecurrentModel supports decode=True only (the only "
                "mode the reference uses, vae_definition.py:546)"
            )
        self.step_input_node = input
        self.output_node = output
        self.state_input_nodes = list(initial_states or [])
        self.final_state_nodes = list(final_states or [])
        self.teacher_force = bool(teacher_force)
        self.output_length = int(output_length)
        self.return_states = bool(return_states)
        self.built = True

    def __call__(
        self, inputs, initial_state=None, initial_readout=None,
        ground_truth=None, **_kwargs,
    ):
        nodes = [initial_readout if initial_readout is not None else inputs]
        nodes += list(initial_state or [])
        self._n_states = len(initial_state or [])
        self._has_gt = ground_truth is not None
        if self._has_gt:
            nodes.append(ground_truth)
        call = Call(self, nodes, single_input=False)
        out_dim = self.output_node.shape[-1]
        node = Node(call, 0, (None, self.output_length, out_dim))
        call.outputs = [node]
        return node

    def call(self, values):
        readout = values[0]
        states = list(values[1 : 1 + self._n_states])
        gt = values[1 + self._n_states] if self._has_gt else None
        outs = []
        prev = np.asarray(readout)  # dtype preserved
        for t in range(self.output_length):
            if t == 0:
                step_in = prev
            elif self.teacher_force:
                step_in = gt[:, t - 1]
            else:
                step_in = prev
            feed = {self.step_input_node: step_in}
            feed.update(zip(self.state_input_nodes, states))
            result = evaluate(
                [self.output_node] + self.final_state_nodes, feed
            )
            prev = result[0]
            states = result[1:]
            outs.append(prev)
        return np.stack(outs, axis=1)


class RecurrentSequential:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "shim RecurrentSequential: not used by any executing "
            "reference path"
        )


__all__ = [
    "RecurrentModel",
    "RecurrentSequential",
    "Activation",
    "Add",
    "Bidirectional",
    "Concatenate",
    "Dense",
    "Embedding",
    "GRU",
    "Input",
    "Lambda",
    "LSTM",
    "SimpleRNN",
]

from . import cells  # noqa: E402,F401

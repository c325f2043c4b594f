"""Minimal executable Keras-2.0.x functional-API engine (numpy).

Lets the reference's ``vae_definition.VAE.create`` (and the classifier
builders) run UNMODIFIED so the differential parity checker can execute the
reference's real graph-assembly code: symbolic ``Node``s built at layer-call
time, a memoized recursive evaluator, ``add_loss`` collection (the
KLDivergenceLayer path), and a layer registry in creation order used for
weight transplanting.

Semantics supplied here (not executed from the reference): graph evaluation
order (topological via memoized recursion -- value-identical to any valid
order) and lazily-built zero weights (the checker transplants the framework's
parameters in, so initializers never matter).
"""

from __future__ import annotations

import numpy as np

# Weighted layers in build order; the parity checker walks this to transplant
# the framework's parameter pytree into the reference graph.
LAYER_REGISTRY: list = []

# Evaluation dtype. float32 matches the framework; the gradient-level
# differential check switches to float64 so finite differences on the
# reference loss are accurate enough to judge the framework's f32 grads.
FLOATX = np.float32


def set_floatx(dtype) -> None:
    global FLOATX
    FLOATX = np.dtype(dtype).type


def reset_state() -> None:
    """Fresh registry + name counters (call before each reference build)."""
    LAYER_REGISTRY.clear()
    Layer._name_counters.clear()


class EvalContext:
    """Collects add_loss values fired during one forward evaluation."""

    def __init__(self):
        self.losses: list[float] = []


_CTX: list[EvalContext] = []


def push_context(ctx: EvalContext) -> None:
    _CTX.append(ctx)


def pop_context() -> EvalContext:
    return _CTX.pop()


def current_context() -> EvalContext | None:
    return _CTX[-1] if _CTX else None


class Node:
    """One symbolic tensor: output ``index`` of a layer application."""

    __slots__ = ("call", "index", "shape")

    def __init__(self, call: "Call", index: int, shape: tuple):
        self.call = call
        self.index = index
        self.shape = shape

    def __repr__(self):
        lname = self.call.layer.name if self.call else "?"
        return f"<Node {lname}[{self.index}] {self.shape}>"


class Call:
    """One application of a layer to input node(s)."""

    __slots__ = ("layer", "inputs", "outputs", "single_input")

    def __init__(self, layer, inputs, single_input: bool):
        self.layer = layer
        self.inputs = inputs  # list[Node]
        self.single_input = single_input
        self.outputs: list[Node] = []


def _as_node_list(inputs):
    if isinstance(inputs, (list, tuple)):
        return list(inputs), False
    return [inputs], True


class Layer:
    """Base layer: lazy build, symbolic __call__, add_loss to the active
    EvalContext (KLDivergenceLayer subclasses this, vae_definition.py:15)."""

    _name_counters: dict[str, int] = {}

    def __init__(self, *args, name: str | None = None, **kwargs):
        if name is None:
            key = self.__class__.__name__.lower()
            n = Layer._name_counters.get(key, 0) + 1
            Layer._name_counters[key] = n
            name = f"{key}_{n}"
        self.name = name
        self.built = False

    # -- subclass surface -------------------------------------------------
    def build(self, input_shapes) -> None:  # shapes mirror the input struct
        pass

    def call(self, values):
        raise NotImplementedError(
            f"{self.__class__.__name__}.call not implemented"
        )

    def compute_output_shape(self, input_shapes):
        # default: identity on single input
        return input_shapes

    # -- framework surface -------------------------------------------------
    def add_loss(self, value, inputs=None) -> None:
        ctx = current_context()
        if ctx is not None:
            ctx.losses.append(float(np.asarray(value)))

    def _register(self) -> None:
        LAYER_REGISTRY.append(self)

    def __call__(self, inputs):
        nodes, single = _as_node_list(inputs)
        shapes = [n.shape for n in nodes]
        shape_struct = shapes[0] if single else shapes
        if not self.built:
            self.build(shape_struct)
            self.built = True
        out_shapes = self.compute_output_shape(shape_struct)
        call = Call(self, nodes, single)
        if isinstance(out_shapes, list):
            call.outputs = [
                Node(call, i, tuple(s)) for i, s in enumerate(out_shapes)
            ]
            return call.outputs
        call.outputs = [Node(call, 0, tuple(out_shapes))]
        return call.outputs[0]


class InputLayer(Layer):
    def __init__(self, shape, name=None, tensor=None):
        super().__init__(name=name)
        self.shape = (None,) + tuple(shape)
        self.tensor = tensor  # optional constant (Input(..., tensor=...))
        self.built = True

    def make_node(self) -> Node:
        call = Call(self, [], True)
        node = Node(call, 0, self.shape)
        call.outputs = [node]
        return node


def Input(shape=None, name=None, tensor=None, **_kwargs):
    """keras.layers.Input: returns the symbolic placeholder node."""
    if shape is None:
        raise ValueError("shim Input needs a shape")
    return InputLayer(shape, name=name, tensor=tensor).make_node()


def evaluate(nodes, feed: dict):
    """Evaluate symbolic ``nodes`` given ``feed`` {Node: np.ndarray}.

    ``feed`` entries override graph-computed values -- RecurrentModel uses
    this to drive its step graph, whose entry nodes are shared with the
    outer graph (vae_definition.py:546 reuses the start-symbol Input as the
    step input).
    """
    memo: dict[int, list] = {}  # id(call) -> list of output values

    def eval_node(node: Node):
        if node in feed:
            return feed[node]
        call = node.call
        key = id(call)
        if key not in memo:
            layer = call.layer
            if isinstance(layer, InputLayer):
                if layer.tensor is not None:
                    memo[key] = [np.asarray(layer.tensor)]
                else:
                    raise KeyError(
                        f"no value fed for Input {layer.name!r}"
                    )
            else:
                vals = [eval_node(n) for n in call.inputs]
                arg = vals[0] if call.single_input else vals
                out = layer.call(arg)
                if not isinstance(out, (list, tuple)):
                    out = [out]
                memo[key] = [np.asarray(v) for v in out]
        return memo[key][node.index]

    return [eval_node(n) for n in nodes]

"""Compat: ``ml_hadoop_experiment.tensorflow.predictor``
(reference tensorflow/predictor.py:12-113) — TF1 frozen-graph session
wrapper with the same public surface. The implementation here is organized
around a single resolver helper rather than per-kind functions, and every
TF import is deferred so the module loads without the optional extra and
only raises when actually used.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterator, List, Optional, Union

feeds_type = Optional[List[str]]
fetches_type = Optional[List[str]]

_TF_ERROR = (
    "tensorflow is not installed; the Predictor compat module needs the "
    "optional 'tensorflow' dependency"
)


def _tf() -> Any:
    try:
        import tensorflow
    except ImportError as e:  # pragma: no cover - env without TF
        raise ImportError(_TF_ERROR) from e
    return tensorflow


def _resolve(graph: Any, names: Optional[List[str]], require: str) -> Dict[str, Any]:
    """Name -> tensor map with a feedable/fetchable requirement.

    Operations resolve through their sole output (ambiguous multi-output
    ops are an error, matching reference :33-35); ``require`` is either
    ``"feed"`` or ``"fetch"`` and enforces the corresponding graph
    capability (reference :40-53).
    """
    tf = _tf()
    out: Dict[str, Any] = {}
    for name in names or ():
        candidate = graph.as_graph_element(name)
        if not isinstance(candidate, tf.Tensor):
            outputs = list(candidate.outputs)
            if len(outputs) != 1:
                raise ValueError(
                    f"Found more than one tensor for operation {candidate}"
                )
            candidate = outputs[0]
        ok = graph.is_feedable(candidate) if require == "feed" else graph.is_fetchable(candidate)
        if not ok:
            raise ValueError(f"{name} should be {require}able but is not")
        out[name] = candidate
    return out


def import_graph_def(graph_def_path: str) -> Any:
    """Load a frozen GraphDef into the current default graph
    (reference :12-16)."""
    tf = _tf()
    raw = tf.io.gfile.GFile(graph_def_path, "rb").read()
    gd = tf.compat.v1.GraphDef()
    gd.ParseFromString(raw)
    return tf.import_graph_def(gd, name="")


def get_node_by_name(graph: Any, name: str) -> Optional[Any]:
    """Graph element by node name, or None (reference :19-23)."""
    known = {node.name for node in graph.as_graph_def().node}
    return graph.as_graph_element(name) if name in known else None


def get_tensors(graph: Any, names: feeds_type) -> Dict[str, Any]:
    """Reference :26-37 (no capability requirement)."""
    tf = _tf()
    out: Dict[str, Any] = {}
    for name in names or ():
        candidate = graph.as_graph_element(name)
        if not isinstance(candidate, tf.Tensor):
            outputs = list(candidate.outputs)
            if len(outputs) != 1:
                raise ValueError(f"Found more than one tensor for operation {candidate}")
            candidate = outputs[0]
        out[name] = candidate
    return out


def get_feedable_tensors(graph: Any, names: feeds_type) -> Dict[str, Any]:
    return _resolve(graph, names, "feed")


def get_fetchable_tensors(graph: Any, names: fetches_type) -> Dict[str, Any]:
    return _resolve(graph, names, "fetch")


class Predictor:
    """TF1 session wrapper (reference :56-113): resolved feed/fetch tensor
    maps; ``predict`` accepts a feed dict or a tf.data dataset factory."""

    def __init__(self, session: Any, feeds: feeds_type, fetches: fetches_type):
        self.session = session
        self.feed_tensors = _resolve(session.graph, feeds, "feed")
        self.fetch_tensors = _resolve(session.graph, fetches, "fetch")

    @staticmethod
    def from_graph(path: str, feeds: feeds_type, fetches: fetches_type) -> "Predictor":
        tf = _tf()
        session = tf.compat.v1.Session(graph=tf.Graph())
        with session.graph.as_default():
            import_graph_def(path)
            # run the table initializer when the frozen graph carries one
            init_op = get_node_by_name(session.graph, "init_all_tables")
            if init_op is not None:
                session.run(init_op)
        return Predictor(session, feeds, fetches)

    def __enter__(self) -> "Predictor":
        return self

    def __exit__(self, *exc: Any) -> None:
        self.session.close()

    def _predict_dict(self, inputs: Dict[str, Any]) -> Dict[str, Any]:
        missing = set(self.feed_tensors) - set(inputs)
        if missing:
            raise KeyError(f"Missing keys in inputs: {missing} (inputs = {inputs})")
        feed = {tensor: inputs[name] for name, tensor in self.feed_tensors.items()}
        return self.session.run(self.fetch_tensors, feed_dict=feed)

    def _predict_dataset(self, factory: Callable[[], Any]) -> Iterator[Dict[str, Any]]:
        tf = _tf()
        with self.session.graph.as_default():
            it = tf.compat.v1.data.make_one_shot_iterator(factory())
            nxt = it.get_next()
            self.session.run(tf.compat.v1.tables_initializer())
            while True:
                try:
                    batch = self.session.run(nxt)
                except tf.errors.OutOfRangeError:
                    return
                yield {**batch, **self._predict_dict(batch)}

    def predict(
        self, inputs: Union[Dict[str, Any], Callable[[], Any]]
    ) -> Union[Iterator[Dict[str, Any]], Dict[str, Any]]:
        if isinstance(inputs, dict):
            return self._predict_dict(inputs)
        if callable(inputs):
            return self._predict_dataset(inputs)
        raise TypeError(f"Expected type dict or tf.data.Dataset but got {type(inputs)}")

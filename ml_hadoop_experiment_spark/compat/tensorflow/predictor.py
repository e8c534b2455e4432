"""Compat: ``ml_hadoop_experiment.tensorflow.predictor``
(reference tensorflow/predictor.py:12-113) — TF1 frozen-graph session
wrapper. Everything here needs the tensorflow extra; imports are deferred
so the module itself loads without TF (matching the engine's soft-import
policy) and raises a clear ImportError only when used.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterator, List, Optional, Union

feeds_type = Optional[List[str]]
fetches_type = Optional[List[str]]


def _tf() -> Any:
    try:
        import tensorflow as tf

        return tf
    except ImportError as e:  # pragma: no cover - env without TF
        raise ImportError(
            "tensorflow is not installed; the Predictor compat module needs "
            "the optional 'tensorflow' dependency"
        ) from e


def import_graph_def(graph_def_path: str) -> Any:
    """Load a frozen GraphDef into the current default graph
    (reference :12-16)."""
    tf = _tf()
    with tf.io.gfile.GFile(graph_def_path, "rb") as f:
        graph_def = tf.compat.v1.GraphDef()
        graph_def.ParseFromString(f.read())
        return tf.import_graph_def(graph_def, name="")


def get_node_by_name(graph: Any, name: str) -> Optional[Any]:
    """Graph element by node name, or None (reference :19-23)."""
    for node in graph.as_graph_def().node:
        if node.name == name:
            return graph.as_graph_element(node.name)
    return None


def get_tensors(graph: Any, names: feeds_type) -> Dict[str, Any]:
    """Resolve names to tensors; single-output ops resolve to their output
    (reference :26-37)."""
    tf = _tf()
    tensors: Dict[str, Any] = {}
    for name in names or []:
        element = graph.as_graph_element(name)
        if isinstance(element, tf.Tensor):
            tensors[name] = element
        else:
            if len(element.outputs) > 1:
                raise ValueError(f"Found more than one tensor for operation {element}")
            tensors[name] = element.outputs[0]
    return tensors


def get_feedable_tensors(graph: Any, names: feeds_type) -> Dict[str, Any]:
    """Reference :40-45."""
    tensors = get_tensors(graph, names)
    for name, tensor in tensors.items():
        if not graph.is_feedable(tensor):
            raise ValueError(f"{name} should be feedable but is not")
    return tensors


def get_fetchable_tensors(graph: Any, names: fetches_type) -> Dict[str, Any]:
    """Reference :48-53."""
    tensors = get_tensors(graph, names)
    for name, tensor in tensors.items():
        if not graph.is_fetchable(tensor):
            raise ValueError(f"{name} should be fetchable but is not")
    return tensors


class Predictor:
    """TF1 session wrapper: resolved feed/fetch tensors + dict or
    tf.data predict paths (reference :56-113)."""

    def __init__(self, session: Any, feeds: feeds_type, fetches: fetches_type):
        self.session = session
        self.feed_tensors = get_feedable_tensors(session.graph, feeds)
        self.fetch_tensors = get_fetchable_tensors(session.graph, fetches)

    @staticmethod
    def from_graph(path: str, feeds: feeds_type, fetches: fetches_type) -> "Predictor":
        tf = _tf()
        session = tf.compat.v1.Session(graph=tf.Graph())
        with session.graph.as_default():
            import_graph_def(path)
            init_all_tables = get_node_by_name(session.graph, "init_all_tables")
            if init_all_tables is not None:
                session.run(init_all_tables)
        return Predictor(session, feeds, fetches)

    def __enter__(self) -> "Predictor":
        return self

    def __exit__(self, *exc: Any) -> None:
        self.session.close()

    def predict(
        self, inputs: Union[Dict[str, Any], Callable[[], Any]]
    ) -> Union[Iterator[Dict[str, Any]], Dict[str, Any]]:
        tf = _tf()
        if isinstance(inputs, dict):
            missing = set(self.feed_tensors) - set(inputs)
            if missing:
                raise KeyError(f"Missing keys in inputs: {missing} (inputs = {inputs})")
            return self.session.run(
                self.fetch_tensors,
                feed_dict={t: inputs[n] for n, t in self.feed_tensors.items()},
            )
        if callable(inputs):

            def _input_gen() -> Iterator[Dict[str, Any]]:
                with self.session.graph.as_default():
                    dataset = inputs()
                    iterator = tf.compat.v1.data.make_one_shot_iterator(dataset)
                    next_element = iterator.get_next()
                    self.session.run(tf.compat.v1.tables_initializer())
                    try:
                        while True:
                            input_dict = self.session.run(next_element)
                            output_dict = self.predict(input_dict)
                            yield {**input_dict, **output_dict}
                    except tf.errors.OutOfRangeError:
                        pass

            return _input_gen()
        raise TypeError(f"Expected type dict or tf.data.Dataset but got {type(inputs)}")

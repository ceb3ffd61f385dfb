#!/usr/bin/env python3
"""Offline converter: pickled scikit-learn RandomForestClassifier (or a
single DecisionTreeClassifier) -> graft-sk-forest JSON, the format
graft.ml.SkForest loads and scores natively on Spark as a literal CASE
chain (zero shuffle, codegen).

This closes the reference's pickled-model interop loop
(openeo_processes_dask_ml/process_implementations/data_model/
scikit_learn_model.py:53 loads the pickle with `pickle.load` and calls
`model.predict`): a Python pickle cannot execute on the JVM, so users run
this converter once, offline, and `load_ml_model` the emitted JSON.

NO sklearn import needed: a restricted Unpickler substitutes inert stub
classes for every `sklearn.*` global (recording constructor args and
state), while numpy objects unpickle for real — the tree data lives
entirely in numpy arrays (`sklearn.tree._tree.Tree.__reduce__` =
`(Tree, (n_features, n_classes, n_outputs), {..., "nodes": structured
ndarray, "values": float64 ndarray})`). Extraction then reads the
documented public node fields by NAME (left_child, right_child, feature,
threshold) so any sklearn >=0.22 node-record layout works.

Trust model: a pickle is a PROGRAM, so find_class is an ALLOWLIST —
sklearn.* names become inert stubs, and only the numpy/builtins globals a
legitimate sklearn model pickle actually references resolve for real
(ndarray reconstructors, dtype, scalar types). Anything else (os.system,
subprocess, codecs, ...) raises UnpicklingError instead of importing.
This blocks the classic reduce-to-arbitrary-callable vector; it does NOT
make converting a malicious pickle "safe" in general (numpy unpickles
real array bytes) — convert models you trust, but a stray `os.system`
payload no longer executes.

Semantics preserved exactly (sklearn's documented predict path):
  - internal node: x[feature] <= threshold -> left child, else right;
  - leaf: class distribution = values[node] normalized to sum 1;
  - forest predict_proba = mean of per-tree leaf distributions;
  - predict = classes_[argmax], numpy argmax = FIRST maximal index.

Usage: python3 tools/convert_sklearn.py model.pkl out.json
"""
import io
import json
import pickle
import sys


class _SkStub:
    """Inert stand-in for any sklearn class found in the pickle."""

    def __init__(self, *args):
        self._reduce_args = args

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self._state = state


# The only non-sklearn globals a RandomForest/DecisionTree pickle needs:
# numpy's array/dtype/scalar reconstructors (protocol-dependent names) and
# the handful of builtins numpy state references. Module -> allowed names.
_ALLOWED = {
    "numpy": {"ndarray", "dtype", "int64", "float64", "intp", "bool_",
              "int32", "float32", "uint8"},
    "numpy.core.multiarray": {"_reconstruct", "scalar"},
    "numpy._core.multiarray": {"_reconstruct", "scalar"},  # numpy >= 2
    "numpy.core.numeric": {"_frombuffer"},
    "numpy._core.numeric": {"_frombuffer"},
    "builtins": {"bytearray", "set", "frozenset", "complex", "slice",
                 "range"},
}


class _SkUnpickler(pickle.Unpickler):
    _cache = {}

    def find_class(self, module, name):
        if module.split(".")[0] == "sklearn":
            key = (module, name)
            if key not in self._cache:
                self._cache[key] = type(name, (_SkStub,),
                                        {"__module__": module})
            return self._cache[key]
        if name in _ALLOWED.get(module, ()):
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f"refusing to resolve {module}.{name}: not in the sklearn-model "
            f"allowlist (a pickle is a program; see the docstring)")


def _load(path):
    with open(path, "rb") as fh:
        return _SkUnpickler(io.BufferedReader(fh)).load()


def _as_label(x):
    f = float(x)
    return int(f) if f.is_integer() else f


def _tree_json(est):
    t = est.tree_
    state = t.__dict__ if "nodes" in t.__dict__ else t._state
    nodes = state["nodes"]
    values = state["values"]
    if values.ndim != 3 or values.shape[1] != 1:
        raise SystemExit(
            f"only single-output classifiers convert (values shape "
            f"{values.shape}); the reference predict path is single-output "
            f"too (scikit_learn_model.py run_model)")
    out = []
    for i in range(len(nodes)):
        left = int(nodes["left_child"][i])
        right = int(nodes["right_child"][i])
        if left == -1:  # TREE_LEAF
            counts = values[i, 0, :]
            total = float(counts.sum())
            probs = [float(c) / total for c in counts]
            out.append({"l": -1, "r": -1, "p": probs})
        else:
            out.append({
                "l": left, "r": right,
                "f": int(nodes["feature"][i]),
                "t": float(nodes["threshold"][i]),
            })
    return {"nodes": out}


def convert(model):
    cls = type(model).__name__
    if hasattr(model, "estimators_"):
        estimators = model.estimators_
    elif hasattr(model, "tree_"):
        estimators = [model]
    else:
        raise SystemExit(f"unsupported model type {cls}: no estimators_ "
                         f"or tree_ attribute")
    if getattr(model, "n_outputs_", 1) != 1:
        raise SystemExit("only single-output classifiers convert")
    return {
        "framework": "graft-sk-forest",
        "source": f"sklearn:{cls}",
        "sklearn_version": getattr(model, "_sklearn_version", "unknown"),
        "n_features": int(model.n_features_in_),
        "classes": [_as_label(c) for c in model.classes_],
        "trees": [_tree_json(e) for e in estimators],
    }


def main(pkl_path, json_path):
    doc = convert(_load(pkl_path))
    with open(json_path, "w") as fh:
        json.dump(doc, fh, separators=(",", ":"))
        fh.write("\n")
    n = len(doc["trees"])
    print(f"wrote {json_path}: {n} tree(s), classes={doc['classes']}")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        raise SystemExit(__doc__.strip().splitlines()[-1])
    main(sys.argv[1], sys.argv[2])

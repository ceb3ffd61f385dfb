#!/usr/bin/env python3
"""Fabricate a scikit-learn-shaped RandomForestClassifier pickle WITHOUT
scikit-learn installed (this image is zero-egress; numpy is present).

Why this exists: the reference backend executes pickled sklearn models
(openeo_processes_dask_ml/process_implementations/data_model/
scikit_learn_model.py:53 — `pickle.load` then `model.predict`). A Python
pickle cannot execute on the JVM, so the interop path for this repo is an
OFFLINE converter (tools/convert_sklearn.py) from the pickle to the
graft-sk-forest JSON the Scala scorer runs natively. This script builds
the committed test fixture for that converter: a pickle whose byte-level
shape matches what `pickle.dumps(RandomForestClassifier)` emits —
GLOBAL/STACK_GLOBAL records for the sklearn classes, the
`sklearn.tree._tree.Tree` __reduce__ protocol
`(Tree, (n_features, n_classes_ndarray, n_outputs), state_dict)` with the
structured `nodes` array and the `(n_nodes, n_outputs, n_classes)`
`values` array — fabricated by registering stub modules under the sklearn
names in sys.modules before pickling (pickle's save_global resolves and
identity-checks the class through sys.modules, nothing more).

The fixture forest: 3 trees over 3 features in [0,1], 2 classes,
hand-written node tables below. The expected per-sample probabilities in
SkForestSpec were derived from these same tables by hand (mean over trees
of the leaf class-count normalizations — the documented
RandomForestClassifier.predict_proba semantics: soft voting, argmax with
first-index tie-break).

Usage: python3 tools/make_sklearn_fixture.py [out.pkl]
"""
import pickle
import sys
import types

import numpy as np

# --- stub sklearn module graph (names only; pickle never calls into it) ---


def _mkmod(name):
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


_sk = _mkmod("sklearn")
_sk_tree_pkg = _mkmod("sklearn.tree")
_sk_tree = _mkmod("sklearn.tree._tree")
_sk_classes = _mkmod("sklearn.tree._classes")
_sk_ens = _mkmod("sklearn.ensemble")
_sk_forest = _mkmod("sklearn.ensemble._forest")
_sk.tree = _sk_tree_pkg
_sk.ensemble = _sk_ens
_sk_tree_pkg._tree = _sk_tree
_sk_tree_pkg._classes = _sk_classes
_sk_ens._forest = _sk_forest


class Tree:
    """Stub with sklearn.tree._tree.Tree's pickle protocol."""

    def __init__(self, n_features, n_classes, n_outputs):
        self.n_features = n_features
        self.n_classes = n_classes
        self.n_outputs = n_outputs
        self._state = {}

    def __getstate__(self):
        return self._state

    def __setstate__(self, state):
        self._state = state

    def __reduce__(self):
        return (Tree, (self.n_features, self.n_classes, self.n_outputs),
                self._state)


Tree.__module__ = "sklearn.tree._tree"
Tree.__qualname__ = "Tree"
_sk_tree.Tree = Tree


class DecisionTreeClassifier:
    pass


DecisionTreeClassifier.__module__ = "sklearn.tree._classes"
DecisionTreeClassifier.__qualname__ = "DecisionTreeClassifier"
_sk_classes.DecisionTreeClassifier = DecisionTreeClassifier
_sk_tree_pkg.DecisionTreeClassifier = DecisionTreeClassifier


class RandomForestClassifier:
    pass


RandomForestClassifier.__module__ = "sklearn.ensemble._forest"
RandomForestClassifier.__qualname__ = "RandomForestClassifier"
_sk_forest.RandomForestClassifier = RandomForestClassifier
_sk_ens.RandomForestClassifier = RandomForestClassifier

# sklearn's node record (sklearn/tree/_tree.pyx NODE_DTYPE, >=1.3 shape
# with missing_go_to_left). Field NAMES are the contract the converter
# reads by; numpy round-trips the dtype itself through the pickle.
NODE_DTYPE = np.dtype([
    ("left_child", "<i8"), ("right_child", "<i8"), ("feature", "<i8"),
    ("threshold", "<f8"), ("impurity", "<f8"), ("n_node_samples", "<i8"),
    ("weighted_n_node_samples", "<f8"), ("missing_go_to_left", "u1"),
])

LEAF = -1  # sklearn TREE_LEAF / TREE_UNDEFINED = -1/-2; leaves use -1


def make_tree(nodes, values, n_features=3, n_classes=2):
    """nodes: list of (left, right, feature, threshold); values: list of
    per-class counts per node."""
    t = Tree(n_features, np.array([n_classes], dtype=np.intp), 1)
    arr = np.zeros(len(nodes), dtype=NODE_DTYPE)
    depth = 0
    for i, (l, r, f, thr) in enumerate(nodes):
        arr[i] = (l, r, f if l != LEAF else -2, thr if l != LEAF else -2.0,
                  0.5, int(sum(values[i])), float(sum(values[i])), 0)
    vals = np.array(values, dtype=np.float64).reshape(len(nodes), 1, n_classes)
    t._state = {
        "max_depth": 3,
        "node_count": len(nodes),
        "nodes": arr,
        "values": vals,
    }
    est = DecisionTreeClassifier()
    est.__dict__.update(
        criterion="gini",
        max_depth=3,
        n_features_in_=n_features,
        n_outputs_=1,
        classes_=np.arange(n_classes, dtype=np.int64),
        n_classes_=n_classes,
        tree_=t,
    )
    return est


# --- the fixture forest: 3 hand-written trees over features 0..2 ---------
# Thresholds sit inside the D58 quality-feature ranges (x1 stop-ratio
# ~0.02-0.11, x2 avg-word-len/8 ~0.53-0.60, x3 words/1000 ~0.02-0.09) so
# the gate query's predictions actually split the documents table.
TREES = [
    # tree 0: split on f0 (stop-ratio), then f1 on the left branch
    make_tree(
        nodes=[(1, 2, 0, 0.0635), (3, 4, 1, 0.5625), (LEAF, LEAF, 0, 0.0),
               (LEAF, LEAF, 0, 0.0), (LEAF, LEAF, 0, 0.0)],
        values=[[30, 34], [18, 10], [12, 24], [13, 2], [5, 8]],
    ),
    # tree 1: split on f2 (length), then f0 on the right branch
    make_tree(
        nodes=[(1, 2, 2, 0.056), (LEAF, LEAF, 0, 0.0), (3, 4, 0, 0.0445),
               (LEAF, LEAF, 0, 0.0), (LEAF, LEAF, 0, 0.0)],
        values=[[29, 35], [20, 11], [9, 24], [2, 15], [7, 9]],
    ),
    # tree 2: a stump on f1 (avg word length)
    make_tree(
        nodes=[(1, 2, 1, 0.5461), (LEAF, LEAF, 0, 0.0),
               (LEAF, LEAF, 0, 0.0)],
        values=[[31, 33], [22, 13], [9, 20]],
    ),
]


def _dump(rf, out_path):
    with open(out_path, "wb") as fh:
        pickle.dump(rf, fh, protocol=4)
    print(f"wrote {out_path}")


def main(out_path):
    rf = RandomForestClassifier()
    rf.__dict__.update(
        n_estimators=len(TREES),
        criterion="gini",
        max_depth=3,
        bootstrap=True,
        random_state=0,
        n_features_in_=3,
        n_outputs_=1,
        classes_=np.array([0, 1], dtype=np.int64),
        n_classes_=2,
        estimators_=TREES,
        _sklearn_version="1.4.2",
    )
    _dump(rf, out_path)


def main_many(out_path, n_classes=12):
    """The MANY-CLASS fixture (sklearn_rf12.pkl): 2 stumps over 12 classes.
    SkForestSpec uses it to pin that the converter handles arbitrary class
    counts and that the scorer's argmax stays a LINEAR-size plan (the
    running-best fold it replaced grew O(2^C)). Leaf design makes the
    expectations hand-checkable: (0.3,0.3,*) -> both stumps left -> class 2
    with prob 1; (0.9,0.9,*) -> right/right -> classes 7 and 11 tie at 0.5
    -> numpy argmax picks the FIRST maximal index, class 7."""
    def leaf(idx):
        v = [0] * n_classes
        v[idx] = 5
        return v
    trees = [
        make_tree(nodes=[(1, 2, 0, 0.5), (LEAF, LEAF, 0, 0.0),
                         (LEAF, LEAF, 0, 0.0)],
                  values=[[1] * n_classes, leaf(2), leaf(7)],
                  n_classes=n_classes),
        make_tree(nodes=[(1, 2, 1, 0.5), (LEAF, LEAF, 0, 0.0),
                         (LEAF, LEAF, 0, 0.0)],
                  values=[[1] * n_classes, leaf(2), leaf(11)],
                  n_classes=n_classes),
    ]
    rf = RandomForestClassifier()
    rf.__dict__.update(
        n_estimators=len(trees),
        criterion="gini",
        max_depth=1,
        bootstrap=True,
        random_state=0,
        n_features_in_=3,
        n_outputs_=1,
        classes_=np.arange(n_classes, dtype=np.int64),
        n_classes_=n_classes,
        estimators_=trees,
        _sklearn_version="1.4.2",
    )
    _dump(rf, out_path)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--many":
        main_many(sys.argv[2] if len(sys.argv) > 2
                  else "tools/fixtures/sklearn_rf12.pkl")
    else:
        main(sys.argv[1] if len(sys.argv) > 1
             else "tools/fixtures/sklearn_rf.pkl")

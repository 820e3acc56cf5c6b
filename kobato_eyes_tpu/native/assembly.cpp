// Native object-construction burst for duplicate-cluster assembly.
//
// The vectorized assembly (dup/types.py:assemble_clusters) decides ordering,
// keepers and grouping as numpy array passes; what remains is building the
// Python result objects — one NamedTuple per cluster member plus one per
// cluster.  At 70k-image scale that burst (~50k objects) costs >100 ms in
// bytecode; constructing the same objects through the C API is ~5x faster
// and keeps the output type-identical (the NamedTuple classes themselves are
// passed in and instantiated via their normal constructors).
//
// CPython extension (PyInit__assembly), built by native/build.py
// load_extension_module.  No numpy headers: index arrays arrive as int64
// buffers via the buffer protocol.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>

namespace {

struct BufGuard {
    Py_buffer *buf;
    explicit BufGuard(Py_buffer *b) : buf(b) {}
    ~BufGuard() {
        if (buf->obj != nullptr) PyBuffer_Release(buf);
    }
};

// build_clusters(entry_type, cluster_type, metas: list (node order),
//                hamm: int64 buffer (node order, <0 => None),
//                entry_order: int64 buffer,
//                starts: int64 buffer, ends: int64 buffer (per cluster,
//                already permuted into final cluster order),
//                keepers: int64 buffer (per cluster, final order))
//   -> list[cluster_type]
PyObject *build_clusters(PyObject * /*self*/, PyObject *args) {
    PyObject *entry_type, *cluster_type, *metas;
    Py_buffer hamm{}, order{}, starts{}, ends{}, keepers{};
    if (!PyArg_ParseTuple(args, "OOOy*y*y*y*y*", &entry_type, &cluster_type,
                          &metas, &hamm, &order, &starts, &ends, &keepers)) {
        return nullptr;
    }
    BufGuard g1(&hamm), g2(&order), g3(&starts), g4(&ends), g5(&keepers);

    if (!PyList_Check(metas)) {
        PyErr_SetString(PyExc_TypeError, "metas must be a list");
        return nullptr;
    }
    const Py_ssize_t k = PyList_GET_SIZE(metas);
    const auto *hamm_p = static_cast<const int64_t *>(hamm.buf);
    const auto *order_p = static_cast<const int64_t *>(order.buf);
    const auto *starts_p = static_cast<const int64_t *>(starts.buf);
    const auto *ends_p = static_cast<const int64_t *>(ends.buf);
    const auto *keep_p = static_cast<const int64_t *>(keepers.buf);
    const Py_ssize_t n_entries = order.len / (Py_ssize_t)sizeof(int64_t);
    const Py_ssize_t n_clusters = starts.len / (Py_ssize_t)sizeof(int64_t);
    if (hamm.len / (Py_ssize_t)sizeof(int64_t) != k || n_entries != k ||
        ends.len != starts.len || keepers.len != starts.len) {
        PyErr_SetString(PyExc_ValueError, "assembly buffer lengths disagree");
        return nullptr;
    }

    // entries in global entry order; a TUPLE so the per-cluster slices below
    // are tuples too (DuplicateCluster.files is an immutable tuple)
    PyObject *entries = PyTuple_New(n_entries);
    if (entries == nullptr) return nullptr;
    for (Py_ssize_t e = 0; e < n_entries; ++e) {
        const int64_t r = order_p[e];
        if (r < 0 || r >= k) {
            Py_DECREF(entries);
            PyErr_SetString(PyExc_IndexError, "entry_order out of range");
            return nullptr;
        }
        PyObject *meta = PyList_GET_ITEM(metas, r);  // borrowed
        PyObject *h;
        if (hamm_p[r] < 0) {
            h = Py_None;
            Py_INCREF(h);
        } else {
            h = PyLong_FromLongLong(hamm_p[r]);
            if (h == nullptr) {
                Py_DECREF(entries);
                return nullptr;
            }
        }
        PyObject *entry =
            PyObject_CallFunctionObjArgs(entry_type, meta, h, nullptr);
        Py_DECREF(h);
        if (entry == nullptr) {
            Py_DECREF(entries);
            return nullptr;
        }
        PyTuple_SET_ITEM(entries, e, entry);  // steals
    }

    PyObject *clusters = PyList_New(n_clusters);
    if (clusters == nullptr) {
        Py_DECREF(entries);
        return nullptr;
    }
    for (Py_ssize_t c = 0; c < n_clusters; ++c) {
        const int64_t s = starts_p[c];
        const int64_t e = ends_p[c];
        if (s < 0 || e < s || e > n_entries) {
            Py_DECREF(entries);
            Py_DECREF(clusters);
            PyErr_SetString(PyExc_IndexError, "cluster bounds out of range");
            return nullptr;
        }
        PyObject *group = PyTuple_GetSlice(entries, s, e);
        if (group == nullptr) {
            Py_DECREF(entries);
            Py_DECREF(clusters);
            return nullptr;
        }
        PyObject *keeper = PyLong_FromLongLong(keep_p[c]);
        PyObject *cluster = (keeper == nullptr)
            ? nullptr
            : PyObject_CallFunctionObjArgs(cluster_type, group, keeper, nullptr);
        Py_XDECREF(keeper);
        Py_DECREF(group);
        if (cluster == nullptr) {
            Py_DECREF(entries);
            Py_DECREF(clusters);
            return nullptr;
        }
        PyList_SET_ITEM(clusters, c, cluster);  // steals
    }
    Py_DECREF(entries);
    return clusters;
}

PyMethodDef methods[] = {
    {"build_clusters", build_clusters, METH_VARARGS,
     "Construct cluster/entry objects from assembly index arrays."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "_assembly",
    "Native duplicate-cluster object construction", -1, methods,
    nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit__assembly(void) { return PyModule_Create(&module); }

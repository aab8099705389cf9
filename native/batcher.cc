// _gnn_batcher — native padded-graph-batch builder.
//
// The host-side hot loop of pretraining is assembling padded GraphBatches
// from the ragged GraphStore arrays: one batch per domain per step, each a
// dozen numpy concatenate/pad calls (data/batch.py build_batch). This CPython
// extension does the same assembly in one fused pass over preallocated
// outputs. Semantics are identical to the Python builder (parity-tested in
// tests/test_data.py); data/batch.py falls back to numpy when the
// extension is not built (scripts/build_native.sh).

#define PY_SSIZE_T_CLEAN
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <Python.h>
#include <numpy/arrayobject.h>

#include <cstdint>
#include <cstring>

namespace {

// Fetch a contiguous array of the expected type or set an error.
PyArrayObject* as_array(PyObject* obj, int typenum, const char* name) {
  PyArrayObject* arr = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(obj, typenum, NPY_ARRAY_C_CONTIGUOUS | NPY_ARRAY_ALIGNED));
  if (arr == nullptr) {
    PyErr_Format(PyExc_TypeError, "argument %s must be convertible to a "
                 "contiguous numpy array", name);
  }
  return arr;
}

PyObject* build_batch(PyObject* /*self*/, PyObject* args) {
  PyObject *node_features_o, *edge_index_o, *node_offsets_o, *edge_offsets_o,
      *y_o, *props_o, *indices_o;
  long n_pad, e_pad, g_pad;
  int with_properties;
  if (!PyArg_ParseTuple(args, "OOOOOOOlllp", &node_features_o, &edge_index_o,
                        &node_offsets_o, &edge_offsets_o, &y_o, &props_o,
                        &indices_o, &n_pad, &e_pad, &g_pad,
                        &with_properties)) {
    return nullptr;
  }

  PyArrayObject* node_features = as_array(node_features_o, NPY_FLOAT32, "node_features");
  PyArrayObject* edge_index = as_array(edge_index_o, NPY_INT64, "edge_index");
  PyArrayObject* node_offsets = as_array(node_offsets_o, NPY_INT64, "node_offsets");
  PyArrayObject* edge_offsets = as_array(edge_offsets_o, NPY_INT64, "edge_offsets");
  PyArrayObject* y_arr = as_array(y_o, NPY_INT64, "y");
  PyArrayObject* props = nullptr;
  if (props_o != Py_None) props = as_array(props_o, NPY_FLOAT32, "graph_properties");
  PyArrayObject* indices = as_array(indices_o, NPY_INT64, "indices");
  if (!node_features || !edge_index || !node_offsets || !edge_offsets ||
      !y_arr || !indices || (props_o != Py_None && !props)) {
    Py_XDECREF(node_features); Py_XDECREF(edge_index); Py_XDECREF(node_offsets);
    Py_XDECREF(edge_offsets); Py_XDECREF(y_arr); Py_XDECREF(props);
    Py_XDECREF(indices);
    return nullptr;
  }

  const npy_intp d = PyArray_DIM(node_features, 1);
  const npy_intp sum_e = PyArray_DIM(edge_index, 1);
  const npy_intp num_graphs_total = PyArray_DIM(node_offsets, 0) - 1;
  const npy_intp g = PyArray_DIM(indices, 0);
  const npy_intp p = props ? PyArray_DIM(props, 1) : 12;
  const bool y_is_per_graph = PyArray_DIM(y_arr, 0) == num_graphs_total;

  const float* nf = static_cast<const float*>(PyArray_DATA(node_features));
  const int64_t* ei = static_cast<const int64_t*>(PyArray_DATA(edge_index));
  const int64_t* noff = static_cast<const int64_t*>(PyArray_DATA(node_offsets));
  const int64_t* eoff = static_cast<const int64_t*>(PyArray_DATA(edge_offsets));
  const int64_t* yv = static_cast<const int64_t*>(PyArray_DATA(y_arr));
  const float* pr = props ? static_cast<const float*>(PyArray_DATA(props)) : nullptr;
  const int64_t* idx = static_cast<const int64_t*>(PyArray_DATA(indices));

  if (g > g_pad) {
    PyErr_Format(PyExc_ValueError, "%ld graphs > g_pad=%ld", (long)g, g_pad);
    goto fail;
  }

  // Validate everything BEFORE allocating outputs, so no failure path can
  // leak freshly-created arrays.
  {
    int64_t total_n = 0, total_e = 0;
    for (npy_intp slot = 0; slot < g; ++slot) {
      const int64_t gi = idx[slot];
      if (gi < 0 || gi >= num_graphs_total) {
        PyErr_Format(PyExc_IndexError, "graph index %lld out of range",
                     (long long)gi);
        goto fail;
      }
      total_n += noff[gi + 1] - noff[gi];
      total_e += eoff[gi + 1] - eoff[gi];
    }
    if (total_n > n_pad || total_e > e_pad) {
      PyErr_Format(PyExc_ValueError,
                   "batch (%lld nodes, %lld edges) exceeds padding "
                   "(n_pad=%ld, e_pad=%ld)",
                   (long long)total_n, (long long)total_e, n_pad, e_pad);
      goto fail;
    }
  }

  {
    // Allocate zero-initialized outputs.
    npy_intp xdims[2] = {n_pad, d};
    npy_intp edims[1] = {e_pad};
    npy_intp ndims[1] = {n_pad};
    npy_intp gdims[1] = {g_pad};
    npy_intp pdims[2] = {g_pad, p};
    PyArrayObject* x = (PyArrayObject*)PyArray_ZEROS(2, xdims, NPY_FLOAT32, 0);
    PyArrayObject* senders = (PyArrayObject*)PyArray_ZEROS(1, edims, NPY_INT32, 0);
    PyArrayObject* receivers = (PyArrayObject*)PyArray_ZEROS(1, edims, NPY_INT32, 0);
    PyArrayObject* edge_mask = (PyArrayObject*)PyArray_ZEROS(1, edims, NPY_FLOAT32, 0);
    PyArrayObject* edge_graph = (PyArrayObject*)PyArray_ZEROS(1, edims, NPY_INT32, 0);
    PyArrayObject* node_mask = (PyArrayObject*)PyArray_ZEROS(1, ndims, NPY_FLOAT32, 0);
    PyArrayObject* node_graph = (PyArrayObject*)PyArray_ZEROS(1, ndims, NPY_INT32, 0);
    PyArrayObject* graph_mask = (PyArrayObject*)PyArray_ZEROS(1, gdims, NPY_FLOAT32, 0);
    PyArrayObject* node_start = (PyArrayObject*)PyArray_ZEROS(1, gdims, NPY_INT32, 0);
    PyArrayObject* n_node = (PyArrayObject*)PyArray_ZEROS(1, gdims, NPY_INT32, 0);
    PyArrayObject* n_edge = (PyArrayObject*)PyArray_ZEROS(1, gdims, NPY_INT32, 0);
    PyArrayObject* y_out = (PyArrayObject*)PyArray_ZEROS(1, gdims, NPY_INT32, 0);
    PyArrayObject* props_out = (PyArrayObject*)PyArray_ZEROS(2, pdims, NPY_FLOAT32, 0);
    if (!x || !senders || !receivers || !edge_mask || !edge_graph ||
        !node_mask || !node_graph || !graph_mask || !node_start || !n_node ||
        !n_edge || !y_out || !props_out) {
      goto fail;
    }

    float* xo = static_cast<float*>(PyArray_DATA(x));
    int32_t* so = static_cast<int32_t*>(PyArray_DATA(senders));
    int32_t* ro = static_cast<int32_t*>(PyArray_DATA(receivers));
    float* emo = static_cast<float*>(PyArray_DATA(edge_mask));
    int32_t* ego = static_cast<int32_t*>(PyArray_DATA(edge_graph));
    float* nmo = static_cast<float*>(PyArray_DATA(node_mask));
    int32_t* ngo = static_cast<int32_t*>(PyArray_DATA(node_graph));
    float* gmo = static_cast<float*>(PyArray_DATA(graph_mask));
    int32_t* nso = static_cast<int32_t*>(PyArray_DATA(node_start));
    int32_t* nno = static_cast<int32_t*>(PyArray_DATA(n_node));
    int32_t* neo = static_cast<int32_t*>(PyArray_DATA(n_edge));
    int32_t* yo = static_cast<int32_t*>(PyArray_DATA(y_out));
    float* po = static_cast<float*>(PyArray_DATA(props_out));

    int64_t node_cursor = 0;
    int64_t edge_cursor = 0;
    for (npy_intp slot = 0; slot < g; ++slot) {
      const int64_t gi = idx[slot];  // validated above
      const int64_t n0 = noff[gi], n1 = noff[gi + 1];
      const int64_t e0 = eoff[gi], e1 = eoff[gi + 1];
      const int64_t nn = n1 - n0, ne = e1 - e0;
      std::memcpy(xo + node_cursor * d, nf + n0 * d, sizeof(float) * nn * d);
      for (int64_t e = 0; e < ne; ++e) {
        so[edge_cursor + e] = static_cast<int32_t>(ei[e0 + e] + node_cursor);
        ro[edge_cursor + e] = static_cast<int32_t>(ei[sum_e + e0 + e] + node_cursor);
        emo[edge_cursor + e] = 1.0f;
        ego[edge_cursor + e] = static_cast<int32_t>(slot);
      }
      for (int64_t nd = 0; nd < nn; ++nd) {
        nmo[node_cursor + nd] = 1.0f;
        ngo[node_cursor + nd] = static_cast<int32_t>(slot);
      }
      gmo[slot] = 1.0f;
      nso[slot] = static_cast<int32_t>(node_cursor);
      nno[slot] = static_cast<int32_t>(nn);
      neo[slot] = static_cast<int32_t>(ne);
      if (y_is_per_graph) yo[slot] = static_cast<int32_t>(yv[gi]);
      if (with_properties && pr != nullptr) {
        std::memcpy(po + slot * p, pr + gi * p, sizeof(float) * p);
      }
      node_cursor += nn;
      edge_cursor += ne;
    }

    PyObject* out = Py_BuildValue(
        "(NNNNNNNNNNNNN)", x, senders, receivers, edge_mask, edge_graph,
        node_mask, node_graph, graph_mask, node_start, n_node, n_edge, y_out,
        props_out);
    Py_DECREF(node_features); Py_DECREF(edge_index); Py_DECREF(node_offsets);
    Py_DECREF(edge_offsets); Py_DECREF(y_arr); Py_XDECREF(props);
    Py_DECREF(indices);
    return out;
  }

fail:
  Py_XDECREF(node_features); Py_XDECREF(edge_index); Py_XDECREF(node_offsets);
  Py_XDECREF(edge_offsets); Py_XDECREF(y_arr); Py_XDECREF(props);
  Py_XDECREF(indices);
  return nullptr;
}

PyMethodDef methods[] = {
    {"build_batch", build_batch, METH_VARARGS,
     "Assemble a padded graph batch from ragged store arrays."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {PyModuleDef_HEAD_INIT, "_gnn_batcher",
                      "Native padded-graph-batch builder", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__gnn_batcher() {
  import_array();
  return PyModule_Create(&module);
}

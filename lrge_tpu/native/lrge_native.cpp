// Native host runtime for lrge_tpu.
//
// The reference keeps its hot host paths in native code (minimap2 C via
// FFI, needletail parsing); our TPU build does the same for the pieces
// that stay on the host:
//
//   * FASTA/FASTQ parsing + record splitting (the reference's
//     needletail equivalent, SURVEY.md C7),
//   * 2-bit base encoding,
//   * the chaining DP for exact-host-fallback rows (identical f32
//     semantics to minimap2's mm_chain_dp scoring, SURVEY.md C15).
//
// Exposed as a CPython extension (no pybind11 in this image); buffers
// cross the boundary via the buffer protocol so numpy arrays are
// zero-copy.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// ---------------------------------------------------------------------
// base encoding (matches ops/encode.py NT4 table)
// ---------------------------------------------------------------------

unsigned char NT4[256];

void init_nt4() {
  memset(NT4, 4, sizeof(NT4));
  NT4[(unsigned char)'A'] = 0;
  NT4[(unsigned char)'C'] = 1;
  NT4[(unsigned char)'G'] = 2;
  NT4[(unsigned char)'T'] = 3;
  NT4[(unsigned char)'a'] = 0;
  NT4[(unsigned char)'c'] = 1;
  NT4[(unsigned char)'g'] = 2;
  NT4[(unsigned char)'t'] = 3;
}

PyObject* py_encode_seq(PyObject*, PyObject* arg) {
  Py_buffer buf;
  if (PyObject_GetBuffer(arg, &buf, PyBUF_SIMPLE) != 0) return nullptr;
  PyObject* out = PyBytes_FromStringAndSize(nullptr, buf.len);
  if (!out) {
    PyBuffer_Release(&buf);
    return nullptr;
  }
  const unsigned char* src = (const unsigned char*)buf.buf;
  unsigned char* dst = (unsigned char*)PyBytes_AS_STRING(out);
  for (Py_ssize_t i = 0; i < buf.len; ++i) dst[i] = NT4[src[i]];
  PyBuffer_Release(&buf);
  return out;
}

// ---------------------------------------------------------------------
// FASTA/FASTQ parsing (decompressed buffer -> list[(id, seq)])
// ---------------------------------------------------------------------

const char* find_nl(const char* p, const char* end) {
  const char* nl = (const char*)memchr(p, '\n', end - p);
  return nl ? nl : end;
}

// strip trailing \r and return length
Py_ssize_t line_len(const char* start, const char* nl) {
  Py_ssize_t n = nl - start;
  if (n > 0 && start[n - 1] == '\r') --n;
  return n;
}

Py_ssize_t id_len(const char* start, Py_ssize_t n) {
  // truncate at first ASCII whitespace (space \t \n \f \r)
  for (Py_ssize_t i = 0; i < n; ++i) {
    char c = start[i];
    if (c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r') return i;
  }
  return n;
}

PyObject* parse_error(const char* msg) {
  PyErr_SetString(PyExc_ValueError, msg);
  return nullptr;
}

PyObject* py_parse_fastx(PyObject*, PyObject* arg) {
  Py_buffer buf;
  if (PyObject_GetBuffer(arg, &buf, PyBUF_SIMPLE) != 0) return nullptr;
  const char* p = (const char*)buf.buf;
  const char* end = p + buf.len;
  PyObject* out = PyList_New(0);
  if (!out) {
    PyBuffer_Release(&buf);
    return nullptr;
  }
  auto fail = [&](const char* msg) -> PyObject* {
    Py_DECREF(out);
    PyBuffer_Release(&buf);
    return parse_error(msg);
  };
  if (p == end) {
    PyBuffer_Release(&buf);
    return out;  // empty
  }
  char mode = *p;
  if (mode != '>' && mode != '@')
    return fail("Unknown sequence format: expected '>' or '@'");
  std::vector<char> seqbuf;
  while (p < end) {
    if (*p != mode) return fail("Malformed record: bad header start");
    ++p;
    const char* nl = find_nl(p, end);
    const char* hdr = p;
    Py_ssize_t hn = line_len(hdr, nl);
    Py_ssize_t idn = id_len(hdr, hn);
    p = nl < end ? nl + 1 : end;
    PyObject* name = PyBytes_FromStringAndSize(hdr, idn);
    PyObject* seq = nullptr;
    if (mode == '>') {
      seqbuf.clear();
      while (p < end && *p != '>') {
        nl = find_nl(p, end);
        seqbuf.insert(seqbuf.end(), p, p + line_len(p, nl));
        p = nl < end ? nl + 1 : end;
      }
      seq = PyBytes_FromStringAndSize(seqbuf.data(), (Py_ssize_t)seqbuf.size());
    } else {
      nl = find_nl(p, end);
      const char* s = p;
      Py_ssize_t sn = line_len(s, nl);
      p = nl < end ? nl + 1 : end;
      if (p >= end || *p != '+') {
        Py_XDECREF(name);
        return fail("Malformed FASTQ record: expected '+' separator");
      }
      nl = find_nl(p, end);
      p = nl < end ? nl + 1 : end;  // skip '+' line
      nl = find_nl(p, end);
      Py_ssize_t qn = line_len(p, nl);
      if (qn != sn) {
        Py_XDECREF(name);
        return fail("Malformed FASTQ record: sequence/quality length mismatch");
      }
      p = nl < end ? nl + 1 : end;
      seq = PyBytes_FromStringAndSize(s, sn);
    }
    if (!name || !seq) {
      Py_XDECREF(name);
      Py_XDECREF(seq);
      Py_DECREF(out);
      PyBuffer_Release(&buf);
      return nullptr;
    }
    PyObject* tup = PyTuple_Pack(2, name, seq);
    Py_DECREF(name);
    Py_DECREF(seq);
    if (!tup || PyList_Append(out, tup) != 0) {
      Py_XDECREF(tup);
      Py_DECREF(out);
      PyBuffer_Release(&buf);
      return nullptr;
    }
    Py_DECREF(tup);
  }
  PyBuffer_Release(&buf);
  return out;
}

// ---------------------------------------------------------------------
// chaining DP (mm_chain_dp scoring semantics, f32 exact)
// ---------------------------------------------------------------------

inline float mg_log2f(float x) {
  union {
    float f;
    uint32_t i;
  } z = {x};
  float log_2 = (float)((int)((z.i >> 23) & 255) - 128);
  z.i &= ~(255u << 23);
  z.i += 127u << 23;
  log_2 += (-0.34484843f * z.f + 2.02466578f) * z.f - 0.67487759f;
  return log_2;
}

// chain_dp(key2, rpos, qpos, span, n, max_gap, bw, max_iter,
//          chn_pen_gap, chn_pen_skip, f_out, p_out)
// key2 groups (rid,strand); all i32 buffers except f/p which are i64.
PyObject* py_chain_dp(PyObject*, PyObject* args) {
  Py_buffer key2, rpos, qpos, span, fbuf, pbuf;
  Py_ssize_t n;
  int max_gap, bw, max_iter;
  float pen_gap, pen_skip;
  if (!PyArg_ParseTuple(args, "y*y*y*y*niiiffy*y*", &key2, &rpos, &qpos, &span,
                        &n, &max_gap, &bw, &max_iter, &pen_gap, &pen_skip,
                        &fbuf, &pbuf))
    return nullptr;
  const int32_t* K = (const int32_t*)key2.buf;
  const int32_t* R = (const int32_t*)rpos.buf;
  const int32_t* Q = (const int32_t*)qpos.buf;
  const int32_t* S = (const int32_t*)span.buf;
  int64_t* F = (int64_t*)fbuf.buf;
  int64_t* P = (int64_t*)pbuf.buf;
  Py_ssize_t st = 0;
  Py_BEGIN_ALLOW_THREADS
  for (Py_ssize_t i = 0; i < n; ++i) {
    while (st < i && (K[st] != K[i] || R[i] > R[st] + max_gap)) ++st;
    Py_ssize_t lo = st;
    if (i - lo > max_iter) lo = i - max_iter;
    int64_t best = S[i];
    int64_t bestj = -1;
    for (Py_ssize_t j = i - 1; j >= lo; --j) {
      if (K[j] != K[i]) continue;
      int64_t dq = (int64_t)Q[i] - Q[j];
      if (dq <= 0 || dq > max_gap) continue;
      int64_t dr = (int64_t)R[i] - R[j];
      if (dr == 0) continue;
      int64_t dd = dr > dq ? dr - dq : dq - dr;
      if (dd > bw) continue;
      int64_t dg = dq < dr ? dq : dr;
      int64_t sc = dg < S[j] ? dg : S[j];
      if (dd != 0 || dg > S[j]) {
        float lin = pen_gap * (float)dd + pen_skip * (float)dg;
        float logp = dd >= 1 ? mg_log2f((float)(dd + 1)) : 0.0f;
        sc -= (int64_t)(int)(lin + 0.5f * logp);
      }
      int64_t cand = sc + F[j];
      if (cand > best) {
        best = cand;
        bestj = j;
      }
    }
    F[i] = best;
    P[i] = bestj;
  }
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&key2);
  PyBuffer_Release(&rpos);
  PyBuffer_Release(&qpos);
  PyBuffer_Release(&span);
  PyBuffer_Release(&fbuf);
  PyBuffer_Release(&pbuf);
  Py_RETURN_NONE;
}

PyMethodDef methods[] = {
    {"encode_seq", py_encode_seq, METH_O,
     "encode_seq(bytes) -> bytes of 2-bit codes (4=ambiguous)"},
    {"parse_fastx", py_parse_fastx, METH_O,
     "parse_fastx(buffer) -> list[(id, seq)] for FASTA/FASTQ data"},
    {"chain_dp", py_chain_dp, METH_VARARGS,
     "chain_dp(key2,rpos,qpos,span,n,max_gap,bw,max_iter,pen_gap,pen_skip,"
     "f_out,p_out)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_lrge_native", "lrge_tpu native host runtime",
    -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__lrge_native(void) {
  init_nt4();
  return PyModule_Create(&moduledef);
}

/* C fast path for the float64 forward-backward oracle.
 *
 * Native-tier counterpart of the reference's Cython extension
 * (pysvihmm setup.py build_ext --inplace; SURVEY.md §2.3): the T-step
 * alpha/beta recursion with per-step K x K matvec + rescaling, in portable
 * C99 against the CPython buffer protocol (no numpy C API needed).
 *
 * Python signature (see oracle/numpy_ref.py fallback for semantics):
 *   fb_c(log_pi, log_A, log_lik, alpha, beta, gamma, xi_sum) -> log_z
 * All arrays are C-contiguous float64 provided by the caller:
 *   log_pi (K,), log_A (K,K), log_lik (T,K) inputs;
 *   alpha (T,K), beta (T,K), gamma (T,K), xi_sum (K,K) outputs.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <math.h>
#include <stdlib.h>

static int get_buf(PyObject *obj, Py_buffer *view, int writable) {
    int flags = PyBUF_C_CONTIGUOUS | PyBUF_FORMAT;
    if (writable) flags |= PyBUF_WRITABLE;
    if (PyObject_GetBuffer(obj, view, flags) != 0) return -1;
    if (view->itemsize != sizeof(double)) {
        PyBuffer_Release(view);
        PyErr_SetString(PyExc_TypeError, "expected float64 array");
        return -1;
    }
    return 0;
}

static PyObject *fb_c(PyObject *self, PyObject *args) {
    PyObject *o_pi, *o_A, *o_ll, *o_al, *o_be, *o_ga, *o_xi;
    if (!PyArg_ParseTuple(args, "OOOOOOO", &o_pi, &o_A, &o_ll, &o_al, &o_be,
                          &o_ga, &o_xi))
        return NULL;

    Py_buffer b_pi, b_A, b_ll, b_al, b_be, b_ga, b_xi;
    if (get_buf(o_pi, &b_pi, 0)) return NULL;
    if (get_buf(o_A, &b_A, 0)) { PyBuffer_Release(&b_pi); return NULL; }
    if (get_buf(o_ll, &b_ll, 0)) { PyBuffer_Release(&b_pi); PyBuffer_Release(&b_A); return NULL; }
    /* release every buffer already acquired when a later one fails */
    if (get_buf(o_al, &b_al, 1)) {
        PyBuffer_Release(&b_pi); PyBuffer_Release(&b_A); PyBuffer_Release(&b_ll);
        return NULL;
    }
    if (get_buf(o_be, &b_be, 1)) {
        PyBuffer_Release(&b_pi); PyBuffer_Release(&b_A); PyBuffer_Release(&b_ll);
        PyBuffer_Release(&b_al);
        return NULL;
    }
    if (get_buf(o_ga, &b_ga, 1)) {
        PyBuffer_Release(&b_pi); PyBuffer_Release(&b_A); PyBuffer_Release(&b_ll);
        PyBuffer_Release(&b_al); PyBuffer_Release(&b_be);
        return NULL;
    }
    if (get_buf(o_xi, &b_xi, 1)) {
        PyBuffer_Release(&b_pi); PyBuffer_Release(&b_A); PyBuffer_Release(&b_ll);
        PyBuffer_Release(&b_al); PyBuffer_Release(&b_be); PyBuffer_Release(&b_ga);
        return NULL;
    }

    const Py_ssize_t K = b_pi.len / (Py_ssize_t)sizeof(double);
    const Py_ssize_t T = (b_ll.len / (Py_ssize_t)sizeof(double)) / K;

    const double *log_pi = (const double *)b_pi.buf;
    const double *log_A = (const double *)b_A.buf;
    const double *log_lik = (const double *)b_ll.buf;
    double *alpha = (double *)b_al.buf;
    double *beta = (double *)b_be.buf;
    double *gamma = (double *)b_ga.buf;
    double *xi_sum = (double *)b_xi.buf;

    double *A = (double *)malloc((size_t)(K * K) * sizeof(double));
    double *lik = (double *)malloc((size_t)(T * K) * sizeof(double));
    double *m = (double *)malloc((size_t)T * sizeof(double));
    double *tmp = (double *)malloc((size_t)K * sizeof(double));
    double log_z = 0.0;

    if (!A || !lik || !m || !tmp) {
        PyErr_NoMemory();
        goto done_err;
    }

    for (Py_ssize_t i = 0; i < K * K; i++) A[i] = exp(log_A[i]);
    for (Py_ssize_t t = 0; t < T; t++) {
        double mx = log_lik[t * K];
        for (Py_ssize_t k = 1; k < K; k++)
            if (log_lik[t * K + k] > mx) mx = log_lik[t * K + k];
        m[t] = mx;
        for (Py_ssize_t k = 0; k < K; k++)
            lik[t * K + k] = exp(log_lik[t * K + k] - mx);
        log_z += mx;
    }

    /* forward */
    {
        double c = 0.0;
        for (Py_ssize_t k = 0; k < K; k++) {
            double a = exp(log_pi[k]) * lik[k];
            alpha[k] = a;
            c += a;
        }
        for (Py_ssize_t k = 0; k < K; k++) alpha[k] /= c;
        log_z += log(c);
        for (Py_ssize_t t = 1; t < T; t++) {
            double c2 = 0.0;
            const double *ap = alpha + (t - 1) * K;
            for (Py_ssize_t j = 0; j < K; j++) {
                double s = 0.0;
                for (Py_ssize_t i = 0; i < K; i++) s += ap[i] * A[i * K + j];
                double a = s * lik[t * K + j];
                alpha[t * K + j] = a;
                c2 += a;
            }
            for (Py_ssize_t j = 0; j < K; j++) alpha[t * K + j] /= c2;
            log_z += log(c2);
        }
    }

    /* backward */
    for (Py_ssize_t k = 0; k < K; k++) beta[(T - 1) * K + k] = 1.0;
    for (Py_ssize_t t = T - 2; t >= 0; t--) {
        const double *bn = beta + (t + 1) * K;
        const double *ln = lik + (t + 1) * K;
        double d = 0.0;
        for (Py_ssize_t k = 0; k < K; k++) tmp[k] = ln[k] * bn[k];
        for (Py_ssize_t i = 0; i < K; i++) {
            double s = 0.0;
            for (Py_ssize_t j = 0; j < K; j++) s += A[i * K + j] * tmp[j];
            beta[t * K + i] = s;
            d += s;
        }
        for (Py_ssize_t i = 0; i < K; i++) beta[t * K + i] /= d;
    }

    /* gamma + xi_sum */
    for (Py_ssize_t i = 0; i < K * K; i++) xi_sum[i] = 0.0;
    for (Py_ssize_t t = 0; t < T; t++) {
        double s = 0.0;
        for (Py_ssize_t k = 0; k < K; k++) {
            double g = alpha[t * K + k] * beta[t * K + k];
            gamma[t * K + k] = g;
            s += g;
        }
        for (Py_ssize_t k = 0; k < K; k++) gamma[t * K + k] /= s;
    }
    for (Py_ssize_t t = 0; t + 1 < T; t++) {
        const double *ap = alpha + t * K;
        const double *bn = beta + (t + 1) * K;
        const double *ln = lik + (t + 1) * K;
        double s = 0.0;
        for (Py_ssize_t i = 0; i < K; i++)
            for (Py_ssize_t j = 0; j < K; j++)
                s += ap[i] * A[i * K + j] * ln[j] * bn[j];
        for (Py_ssize_t i = 0; i < K; i++)
            for (Py_ssize_t j = 0; j < K; j++)
                xi_sum[i * K + j] += ap[i] * A[i * K + j] * ln[j] * bn[j] / s;
    }

    free(A); free(lik); free(m); free(tmp);
    PyBuffer_Release(&b_pi); PyBuffer_Release(&b_A); PyBuffer_Release(&b_ll);
    PyBuffer_Release(&b_al); PyBuffer_Release(&b_be); PyBuffer_Release(&b_ga);
    PyBuffer_Release(&b_xi);
    return PyFloat_FromDouble(log_z);

done_err:
    free(A); free(lik); free(m); free(tmp);
    PyBuffer_Release(&b_pi); PyBuffer_Release(&b_A); PyBuffer_Release(&b_ll);
    PyBuffer_Release(&b_al); PyBuffer_Release(&b_be); PyBuffer_Release(&b_ga);
    PyBuffer_Release(&b_xi);
    return NULL;
}

static PyMethodDef methods[] = {
    {"fb_c", fb_c, METH_VARARGS,
     "forward-backward in C: fb_c(log_pi, log_A, log_lik, alpha, beta, gamma, xi_sum) -> log_z"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "_fb_ext", "C forward-backward oracle fast path",
    -1, methods,
};

PyMODINIT_FUNC PyInit__fb_ext(void) { return PyModule_Create(&module); }

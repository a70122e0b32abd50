/* kmerset_pool: a pooling NumPy data allocator (NEP 49).
 *
 * Role in the framework: the host-runtime allocator, the counterpart of
 * the reference's mimalloc link (reference: CMakeLists.txt:36-38,
 * extern/install.sh mimalloc 1.6.7).  The pipelines here churn through
 * large short-lived NumPy temporaries (hundreds of MB per phase); the
 * default allocator routes those to mmap/munmap, so every temporary
 * pays the OS first-touch provisioning cost again.  On bare metal that
 * cost is small; under the virtualized hosts this framework targets it
 * is routinely the dominant wall-clock item (measured here: ~8 s/GB of
 * fresh pages vs ~0.1 s/GB for recycled ones).
 *
 * Strategy: size-segregated freelists of 2 MB-granular blocks that are
 * NEVER returned to the OS until a retention cap is reached — each
 * physical page is provisioned once per process and then recycled warm.
 * Small allocations (< 1 MB) delegate to libc malloc but still carry
 * the 64-byte header so free()/realloc() can route by origin.
 *
 * Installed process-wide for NumPy via PyDataMem_SetHandler by
 * kmerset_tpu/__init__.py (opt out with KMERSET_TPU_POOL=0; cap with
 * KMERSET_TPU_POOL_MAX bytes, default 16 GB retained).
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define NPY_NO_DEPRECATED_API NPY_1_22_API_VERSION
#define NPY_TARGET_VERSION NPY_1_22_API_VERSION
#include <numpy/arrayobject.h>

#include <pthread.h>
#include <stdint.h>
#include <string.h>
#include <sys/mman.h>
#include <unistd.h>

#define CHUNK (2UL << 20)        /* bin granularity: 2 MB */
#define POOL_MIN (1UL << 20)     /* pool blocks at/above 1 MB */
#define NBINS 4096               /* largest binned block: 8 GB */
#define HDR 64                   /* per-allocation header (keeps 64B alignment) */
#define MAGIC_POOL 0x706f6f6c6b6d7231UL
#define MAGIC_LIBC 0x6c6962636b6d7231UL

typedef struct header {
    uint64_t magic;
    size_t block_size;   /* full mapped/malloced size incl. header */
    struct header *next; /* freelist link (only while free) */
} header_t;

static header_t *bins[NBINS];
static pthread_mutex_t lock = PTHREAD_MUTEX_INITIALIZER;
static size_t retained_bytes = 0;  /* bytes sitting in freelists */
static size_t retain_cap = 16UL << 30;
static size_t stat_pool_hits = 0, stat_pool_misses = 0, stat_unmapped = 0;

static size_t bin_index(size_t block_size) { return block_size / CHUNK; }

/* fresh_out (optional): set to 1 when the returned block came from a new
 * anonymous mmap — its user bytes are kernel-zeroed and UNPROVISIONED, so
 * calloc must not memset it (that would eagerly pay the ~per-byte OS page
 * provisioning this allocator exists to avoid); 0 for recycled-pool or
 * libc-malloc blocks, whose contents are dirty. */
static void *pool_malloc_fresh(size_t size, int *fresh_out) {
    if (fresh_out) *fresh_out = 0;
    if (size > SIZE_MAX - HDR - CHUNK) return NULL; /* round-up overflow */
    size_t need = size + HDR;
    if (size < POOL_MIN) {
        header_t *h = (header_t *)malloc(need);
        if (!h) return NULL;
        h->magic = MAGIC_LIBC;
        h->block_size = need;
        return (char *)h + HDR;
    }
    size_t block = (need + CHUNK - 1) & ~(CHUNK - 1);
    size_t bi = bin_index(block);
    header_t *h = NULL;
    if (bi < NBINS) {
        /* First fit upward: a warm block up to 2x the request beats a
         * fresh mmap (OS page provisioning costs ~per-byte; internal
         * waste in already-provisioned pages costs nothing). */
        size_t hi = bi * 2 + 2;
        if (hi > NBINS) hi = NBINS;
        pthread_mutex_lock(&lock);
        for (size_t j = bi; j < hi; j++) {
            if (bins[j]) {
                h = bins[j];
                bins[j] = h->next;
                retained_bytes -= h->block_size;
                stat_pool_hits++;
                break;
            }
        }
        if (!h) stat_pool_misses++;
        pthread_mutex_unlock(&lock);
    }
    if (!h) {
        void *p = mmap(NULL, block, PROT_READ | PROT_WRITE,
                       MAP_PRIVATE | MAP_ANONYMOUS, -1, 0);
        if (p == MAP_FAILED) return NULL;
        h = (header_t *)p;
        h->block_size = block;
        if (fresh_out) *fresh_out = 1;
    }
    h->magic = MAGIC_POOL;
    return (char *)h + HDR;
}

static void *pool_malloc_impl(size_t size) {
    return pool_malloc_fresh(size, NULL);
}

static void pool_free_impl(void *ptr) {
    if (!ptr) return;
    header_t *h = (header_t *)((char *)ptr - HDR);
    if (h->magic == MAGIC_LIBC) {
        h->magic = 0;
        free(h);
        return;
    }
    if (h->magic != MAGIC_POOL) {
        /* Not ours (allocated before the handler was installed, and
         * numpy routed the free here anyway — should not happen, since
         * numpy frees with the array's own handler; fail safe). */
        free(ptr);
        return;
    }
    size_t block = h->block_size;
    size_t bi = bin_index(block);
    pthread_mutex_lock(&lock);
    if (bi < NBINS && retained_bytes + block <= retain_cap) {
        h->next = bins[bi];
        bins[bi] = h;
        retained_bytes += block;
        pthread_mutex_unlock(&lock);
        return;
    }
    stat_unmapped++;
    pthread_mutex_unlock(&lock);
    munmap(h, block);
}

static size_t usable_size(void *ptr) {
    header_t *h = (header_t *)((char *)ptr - HDR);
    return h->block_size - HDR;
}

/* --- NEP 49 hooks ------------------------------------------------------ */

static void *hook_malloc(void *ctx, size_t size) {
    (void)ctx;
    return pool_malloc_impl(size ? size : 1);
}

static void *hook_calloc(void *ctx, size_t nelem, size_t elsize) {
    (void)ctx;
    if (elsize && nelem > (SIZE_MAX - HDR) / elsize) return NULL;
    size_t size = nelem * elsize;
    int fresh = 0;
    void *p = pool_malloc_fresh(size ? size : 1, &fresh);
    /* Recycled pool pages are dirty; zero explicitly (memset on warm
     * pages runs at memory bandwidth).  A FRESH anonymous mmap is
     * already kernel-zeroed and unprovisioned — memset there would
     * eagerly first-touch every page (~8 s/GB on the virtualized hosts
     * this pool targets) for zeros the kernel provides lazily, charging
     * np.zeros users for pages they may never densely write. */
    if (p && !fresh) memset(p, 0, size);
    return p;
}

static void *hook_realloc(void *ctx, void *ptr, size_t new_size) {
    (void)ctx;
    if (!ptr) return pool_malloc_impl(new_size ? new_size : 1);
    if (new_size == 0) new_size = 1;
    size_t usable = usable_size(ptr);
    header_t *h = (header_t *)((char *)ptr - HDR);
    if (new_size <= usable &&
        (h->magic == MAGIC_LIBC || usable < new_size + (CHUNK * 2)))
        return ptr; /* fits; keep (don't hoard grossly oversized blocks) */
    void *p = pool_malloc_impl(new_size);
    if (!p) return NULL;
    memcpy(p, ptr, usable < new_size ? usable : new_size);
    pool_free_impl(ptr);
    return p;
}

static void hook_free(void *ctx, void *ptr, size_t size) {
    (void)ctx;
    (void)size;
    pool_free_impl(ptr);
}

static PyDataMem_Handler pool_handler = {
    "kmerset_pool",
    1,
    {
        NULL,
        hook_malloc,
        hook_calloc,
        hook_realloc,
        hook_free,
    },
};

/* --- module ------------------------------------------------------------ */

static PyObject *py_install(PyObject *self, PyObject *args) {
    (void)self;
    unsigned long long cap = 0;
    if (!PyArg_ParseTuple(args, "|K", &cap)) return NULL;
    if (cap) retain_cap = (size_t)cap;
    PyObject *capsule =
        PyCapsule_New(&pool_handler, "mem_handler", NULL);
    if (!capsule) return NULL;
    PyObject *old = PyDataMem_SetHandler(capsule);
    Py_DECREF(capsule);
    if (!old) return NULL;
    return old;
}

static PyObject *py_stats(PyObject *self, PyObject *args) {
    (void)self;
    (void)args;
    /* Snapshot first, build the dict unlocked: Python allocation can
     * trigger GC, GC can dealloc a pooled array, and its free hook would
     * re-enter this non-recursive mutex. */
    pthread_mutex_lock(&lock);
    unsigned long long rb = retained_bytes, rc = retain_cap,
                       h = stat_pool_hits, m = stat_pool_misses,
                       u = stat_unmapped;
    pthread_mutex_unlock(&lock);
    return Py_BuildValue(
        "{s:K,s:K,s:K,s:K,s:K}",
        "retained_bytes", rb, "retain_cap", rc, "pool_hits", h,
        "pool_misses", m, "unmapped", u);
}

static PyObject *py_trim(PyObject *self, PyObject *args) {
    /* Releases all retained blocks to the OS (tests / memory pressure). */
    (void)self;
    (void)args;
    pthread_mutex_lock(&lock);
    size_t released = 0;
    for (size_t bi = 0; bi < NBINS; bi++) {
        header_t *h = bins[bi];
        bins[bi] = NULL;
        while (h) {
            header_t *nx = h->next;
            released += h->block_size;
            munmap(h, h->block_size);
            h = nx;
        }
    }
    retained_bytes = 0;
    pthread_mutex_unlock(&lock);
    return PyLong_FromSize_t(released);
}

static PyMethodDef methods[] = {
    {"install", py_install, METH_VARARGS,
     "install(cap_bytes=0) -> old handler capsule.  Installs the pooling "
     "allocator as the NumPy data allocator for arrays created after this "
     "call."},
    {"stats", py_stats, METH_NOARGS, "Pool statistics dict."},
    {"trim", py_trim, METH_NOARGS,
     "Release all retained freelist blocks to the OS; returns bytes freed."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "kmerset_pool",
    "Pooling NumPy data allocator (NEP 49) — mimalloc-parity host runtime "
    "allocator.",
    -1, methods, NULL, NULL, NULL, NULL,
};

/* fork() while another thread holds the pool mutex would leave the
 * child's mutex locked forever (mimalloc installs the same handlers). */
static void fork_prepare(void) { pthread_mutex_lock(&lock); }
static void fork_release(void) { pthread_mutex_unlock(&lock); }

PyMODINIT_FUNC PyInit_kmerset_pool(void) {
    import_array();
    /* Default retention: min(16 GB, half of physical RAM) — hoarding
     * freed pages must not push a small host into swap. */
    long pages = sysconf(_SC_PHYS_PAGES), psize = sysconf(_SC_PAGE_SIZE);
    if (pages > 0 && psize > 0) {
        size_t half = ((size_t)pages / 2) * (size_t)psize;
        if (half < retain_cap) retain_cap = half > CHUNK ? half : CHUNK;
    }
    const char *cap = getenv("KMERSET_TPU_POOL_MAX");
    if (cap && cap[0]) {
        char *end = NULL;
        unsigned long long v = strtoull(cap, &end, 10);
        if (end && *end == 0 && v > 0) retain_cap = (size_t)v;
    }
    static int atfork_installed = 0;
    if (!atfork_installed) {
        atfork_installed = 1;
        pthread_atfork(fork_prepare, fork_release, fork_release);
    }
    return PyModule_Create(&moduledef);
}

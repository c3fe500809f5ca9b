/* tdc_memhook: LD_PRELOAD malloc interposer for byte-accurate per-phase
 * heap accounting — the rebuild's analogue of the reference's link-time
 * malloc override (src/tudocomp_stat/malloc.cpp:24-84, which tracks block
 * sizes through a magic header and feeds malloc_callback::on_alloc/
 * on_free). Here glibc's malloc_usable_size() replaces the header, and
 * the counters are C11 atomics so allocations from any thread (Python,
 * JAX worker pools, the native runtime) are all counted.
 *
 * Usage: LD_PRELOAD=native/libtdc_memhook.so python -m tudocomp_tpu --stats ...
 * (the CLI re-execs itself with the preload when TDC_MALLOC_HOOK=1).
 * StatPhase reads the counters via ctypes: tdc_mem_current/tdc_mem_peak/
 * tdc_mem_reset_peak.
 *
 * Bootstrap: dlsym(RTLD_NEXT, ...) may itself allocate (glibc calls
 * calloc), so a small static arena serves allocations made while the
 * real symbols are being resolved; frees of arena pointers are ignored.
 */
#define _GNU_SOURCE
#include <dlfcn.h>
#include <malloc.h>
#include <stdatomic.h>
#include <stddef.h>
#include <stdint.h>
#include <string.h>

static void* (*real_malloc)(size_t);
static void* (*real_calloc)(size_t, size_t);
static void* (*real_realloc)(void*, size_t);
static void (*real_free)(void*);
static void* (*real_memalign)(size_t, size_t);
static int (*real_posix_memalign)(void**, size_t, size_t);

static _Atomic long long g_current = 0;
static _Atomic long long g_peak = 0;

static char boot_buf[1 << 16];
static _Atomic size_t boot_off = 0;
static volatile int initing = 0;

static int in_boot(const void* p) {
    return (const char*)p >= boot_buf && (const char*)p < boot_buf + sizeof(boot_buf);
}

static void* boot_alloc(size_t sz) {
    size_t need = (sz + 15) & ~(size_t)15;
    size_t off = atomic_fetch_add(&boot_off, need);
    if (off + need > sizeof(boot_buf)) return 0;
    return boot_buf + off;
}

static void hook_init(void) {
    if (real_malloc) return;
    initing = 1;
    real_malloc = (void* (*)(size_t))dlsym(RTLD_NEXT, "malloc");
    real_calloc = (void* (*)(size_t, size_t))dlsym(RTLD_NEXT, "calloc");
    real_realloc = (void* (*)(void*, size_t))dlsym(RTLD_NEXT, "realloc");
    real_free = (void (*)(void*))dlsym(RTLD_NEXT, "free");
    real_memalign = (void* (*)(size_t, size_t))dlsym(RTLD_NEXT, "memalign");
    real_posix_memalign =
        (int (*)(void**, size_t, size_t))dlsym(RTLD_NEXT, "posix_memalign");
    initing = 0;
}

static void acct(long long d) {
    long long cur = atomic_fetch_add(&g_current, d) + d;
    long long p = atomic_load(&g_peak);
    while (cur > p &&
           !atomic_compare_exchange_weak(&g_peak, &p, cur)) {
    }
}

void* malloc(size_t sz) {
    if (!real_malloc) {
        if (initing) return boot_alloc(sz);
        hook_init();
    }
    void* p = real_malloc(sz);
    if (p) acct((long long)malloc_usable_size(p));
    return p;
}

void* calloc(size_t n, size_t sz) {
    if (!real_calloc) {
        if (initing) {
            void* p = boot_alloc(n * sz);
            if (p) memset(p, 0, n * sz);
            return p;
        }
        hook_init();
    }
    void* p = real_calloc(n, sz);
    if (p) acct((long long)malloc_usable_size(p));
    return p;
}

void* realloc(void* old, size_t sz) {
    if (!real_realloc) hook_init();
    if (in_boot(old)) {  /* bootstrap block: treat as fresh alloc */
        void* p = real_malloc(sz);
        if (p) acct((long long)malloc_usable_size(p));
        return p;
    }
    long long before = old ? (long long)malloc_usable_size(old) : 0;
    void* p = real_realloc(old, sz);
    if (p) acct((long long)malloc_usable_size(p) - before);
    return p;
}

void free(void* p) {
    if (!p || in_boot(p)) return;
    if (!real_free) hook_init();
    acct(-(long long)malloc_usable_size(p));
    real_free(p);
}

void* memalign(size_t align, size_t sz) {
    if (!real_memalign) hook_init();
    void* p = real_memalign ? real_memalign(align, sz) : 0;
    if (p) acct((long long)malloc_usable_size(p));
    return p;
}

int posix_memalign(void** out, size_t align, size_t sz) {
    if (!real_posix_memalign) hook_init();
    int rc = real_posix_memalign ? real_posix_memalign(out, align, sz) : -1;
    if (rc == 0 && *out) acct((long long)malloc_usable_size(*out));
    return rc;
}

/* -- counter API (read via ctypes from stats/phase.py) ------------------- */

long long tdc_mem_current(void) { return atomic_load(&g_current); }
long long tdc_mem_peak(void) { return atomic_load(&g_peak); }
void tdc_mem_reset_peak(void) {
    atomic_store(&g_peak, atomic_load(&g_current));
}
int tdc_memhook_active(void) { return 1; }

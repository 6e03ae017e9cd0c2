/* BLADE-TPU native runtime components.
 *
 * 1. Packed prompt-embedding store with a background prefetch thread —
 *    the data-loader for data-free TDM training.  The reference re-loads a
 *    pickle per sample per step from Python (train_cogvideo_tdm.py:1586);
 *    here embeddings live in one packed binary file, reads are pread()s of
 *    fixed-size records, and a pthread warms the page cache for the next
 *    batch while the current step computes.
 *
 * 2. Generalized-Hilbert ("gilbert") 3-D curve generation — the token
 *    reordering permutation for ASA, generated natively for large latent
 *    grids (the Python generator is O(N) too but pays interpreter costs on
 *    every new geometry).
 *
 * Build: cc -O2 -shared -fPIC -pthread blade_native.c -o blade_native.so
 */

#define _GNU_SOURCE
#include <fcntl.h>
#include <pthread.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <unistd.h>

/* ------------------------------------------------------------------ */
/* Embedding store                                                     */
/* ------------------------------------------------------------------ */

typedef struct {
    int fd;
    int64_t record_bytes;
    int64_t n_records;
    /* prefetch state */
    pthread_t thread;
    int thread_live;
    pthread_mutex_t mu;
    int64_t pending[4096];
    int n_pending;
    int shutdown;
    pthread_cond_t cv;
} EmbedStore;

static void *prefetch_main(void *arg) {
    EmbedStore *s = (EmbedStore *)arg;
    char *buf = malloc((size_t)s->record_bytes);
    for (;;) {
        pthread_mutex_lock(&s->mu);
        while (s->n_pending == 0 && !s->shutdown)
            pthread_cond_wait(&s->cv, &s->mu);
        if (s->shutdown && s->n_pending == 0) {
            pthread_mutex_unlock(&s->mu);
            break;
        }
        int64_t idx = s->pending[--s->n_pending];
        pthread_mutex_unlock(&s->mu);
        if (idx >= 0 && idx < s->n_records) {
            /* touch the record so the page cache holds it */
            ssize_t r = pread(s->fd, buf, (size_t)s->record_bytes,
                              (off_t)(idx * s->record_bytes));
            (void)r;
        }
    }
    free(buf);
    return NULL;
}

EmbedStore *embed_store_open(const char *path, int64_t record_bytes) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return NULL;
    off_t size = lseek(fd, 0, SEEK_END);
    EmbedStore *s = calloc(1, sizeof(EmbedStore));
    s->fd = fd;
    s->record_bytes = record_bytes;
    s->n_records = size / record_bytes;
    pthread_mutex_init(&s->mu, NULL);
    pthread_cond_init(&s->cv, NULL);
    if (pthread_create(&s->thread, NULL, prefetch_main, s) == 0)
        s->thread_live = 1;
    return s;
}

int64_t embed_store_len(EmbedStore *s) { return s ? s->n_records : -1; }

/* synchronous read of one record into out */
int embed_store_get(EmbedStore *s, int64_t idx, void *out) {
    if (!s || idx < 0 || idx >= s->n_records) return -1;
    ssize_t r = pread(s->fd, out, (size_t)s->record_bytes,
                      (off_t)(idx * s->record_bytes));
    return r == (ssize_t)s->record_bytes ? 0 : -1;
}

/* queue indices for background page-cache warming */
void embed_store_prefetch(EmbedStore *s, const int64_t *indices, int n) {
    if (!s || !s->thread_live) return;
    pthread_mutex_lock(&s->mu);
    for (int i = 0; i < n && s->n_pending < 4096; i++)
        s->pending[s->n_pending++] = indices[i];
    pthread_cond_signal(&s->cv);
    pthread_mutex_unlock(&s->mu);
}

void embed_store_close(EmbedStore *s) {
    if (!s) return;
    if (s->thread_live) {
        pthread_mutex_lock(&s->mu);
        s->shutdown = 1;
        pthread_cond_signal(&s->cv);
        pthread_mutex_unlock(&s->mu);
        pthread_join(s->thread, NULL);
    }
    close(s->fd);
    free(s);
}

/* ------------------------------------------------------------------ */
/* Gilbert 3-D curve                                                   */
/* ------------------------------------------------------------------ */

typedef struct {
    int32_t *out;
    int64_t n;
    int w; /* for flat index */
    int h;
} GilbertCtx;

static int sgn(int v) { return (v > 0) - (v < 0); }

/* floor division by 2 (C truncates toward zero; the curve needs floor) */
static int fdiv2(int v) { return (v - (v < 0 && (v & 1))) / 2; }

static void gen3d(GilbertCtx *c, int x, int y, int z, int ax, int ay, int az,
                  int bx, int by, int bz, int cx, int cy, int cz) {
    int w = abs(ax + ay + az), h = abs(bx + by + bz), d = abs(cx + cy + cz);
    int dax = sgn(ax), day = sgn(ay), daz = sgn(az);
    int dbx = sgn(bx), dby = sgn(by), dbz = sgn(bz);
    int dcx = sgn(cx), dcy = sgn(cy), dcz = sgn(cz);

    if (h == 1 && d == 1) {
        for (int i = 0; i < w; i++, x += dax, y += day, z += daz)
            c->out[c->n++] = x + c->w * (y + c->h * z);
        return;
    }
    if (w == 1 && d == 1) {
        for (int i = 0; i < h; i++, x += dbx, y += dby, z += dbz)
            c->out[c->n++] = x + c->w * (y + c->h * z);
        return;
    }
    if (w == 1 && h == 1) {
        for (int i = 0; i < d; i++, x += dcx, y += dcy, z += dcz)
            c->out[c->n++] = x + c->w * (y + c->h * z);
        return;
    }

    int ax2 = fdiv2(ax), ay2 = fdiv2(ay), az2 = fdiv2(az);
    int bx2 = fdiv2(bx), by2 = fdiv2(by), bz2 = fdiv2(bz);
    int cx2 = fdiv2(cx), cy2 = fdiv2(cy), cz2 = fdiv2(cz);
    int w2 = abs(ax2 + ay2 + az2), h2 = abs(bx2 + by2 + bz2),
        d2 = abs(cx2 + cy2 + cz2);
    if ((w2 % 2) && (w > 2)) { ax2 += dax; ay2 += day; az2 += daz; }
    if ((h2 % 2) && (h > 2)) { bx2 += dbx; by2 += dby; bz2 += dbz; }
    if ((d2 % 2) && (d > 2)) { cx2 += dcx; cy2 += dcy; cz2 += dcz; }

    if ((2 * w > 3 * h) && (2 * w > 3 * d)) {
        gen3d(c, x, y, z, ax2, ay2, az2, bx, by, bz, cx, cy, cz);
        gen3d(c, x + ax2, y + ay2, z + az2, ax - ax2, ay - ay2, az - az2,
              bx, by, bz, cx, cy, cz);
    } else if (3 * h > 4 * d) {
        gen3d(c, x, y, z, bx2, by2, bz2, cx, cy, cz, ax2, ay2, az2);
        gen3d(c, x + bx2, y + by2, z + bz2, ax, ay, az, bx - bx2, by - by2,
              bz - bz2, cx, cy, cz);
        gen3d(c, x + (ax - dax) + (bx2 - dbx), y + (ay - day) + (by2 - dby),
              z + (az - daz) + (bz2 - dbz), -bx2, -by2, -bz2, cx, cy, cz,
              -(ax - ax2), -(ay - ay2), -(az - az2));
    } else if (3 * d > 4 * h) {
        gen3d(c, x, y, z, cx2, cy2, cz2, ax2, ay2, az2, bx, by, bz);
        gen3d(c, x + cx2, y + cy2, z + cz2, ax, ay, az, bx, by, bz,
              cx - cx2, cy - cy2, cz - cz2);
        gen3d(c, x + (ax - dax) + (cx2 - dcx), y + (ay - day) + (cy2 - dcy),
              z + (az - daz) + (cz2 - dcz), -cx2, -cy2, -cz2,
              -(ax - ax2), -(ay - ay2), -(az - az2), bx, by, bz);
    } else {
        gen3d(c, x, y, z, bx2, by2, bz2, cx2, cy2, cz2, ax2, ay2, az2);
        gen3d(c, x + bx2, y + by2, z + bz2, cx, cy, cz, ax2, ay2, az2,
              bx - bx2, by - by2, bz - bz2);
        gen3d(c, x + (bx2 - dbx) + (cx - dcx), y + (by2 - dby) + (cy - dcy),
              z + (bz2 - dbz) + (cz - dcz), ax, ay, az, -bx2, -by2, -bz2,
              -(cx - cx2), -(cy - cy2), -(cz - cz2));
        gen3d(c, x + (ax - dax) + bx2 + (cx - dcx),
              y + (ay - day) + by2 + (cy - dcy),
              z + (az - daz) + bz2 + (cz - dcz), -cx, -cy, -cz,
              -(ax - ax2), -(ay - ay2), -(az - az2),
              bx - bx2, by - by2, bz - bz2);
        gen3d(c, x + (ax - dax) + (bx2 - dbx), y + (ay - day) + (by2 - dby),
              z + (az - daz) + (bz2 - dbz), -bx2, -by2, -bz2, cx2, cy2, cz2,
              -(ax - ax2), -(ay - ay2), -(az - az2));
    }
}

/* Fills out[n] with flat coordinates (x + w*(y + h*z)) in curve order. */
int gilbert3d_fill(int w, int h, int d, int32_t *out) {
    GilbertCtx c = {out, 0, w, h};
    if (w >= h && w >= d)
        gen3d(&c, 0, 0, 0, w, 0, 0, 0, h, 0, 0, 0, d);
    else if (h >= w && h >= d)
        gen3d(&c, 0, 0, 0, 0, h, 0, w, 0, 0, 0, 0, d);
    else
        gen3d(&c, 0, 0, 0, 0, 0, d, w, 0, 0, 0, h, 0);
    return c.n == (int64_t)w * h * d ? 0 : -1;
}

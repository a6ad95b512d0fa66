#include "cdb.h"
#include <stdlib.h>
#include <string.h>
#include <unistd.h>

static uint32_t cdb_hash(const void *key, unsigned klen) {
  const unsigned char *p = key;
  uint32_t h = 5381;
  while (klen--) h = ((h << 5) + h) ^ *p++;
  return h;
}

static int wr(int fd, const void *buf, size_t n) {
  const char *p = buf;
  while (n) {
    ssize_t r = write(fd, p, n);
    if (r <= 0) return -1;
    p += r; n -= r;
  }
  return 0;
}

static void put32(unsigned char *p, uint32_t v) {
  p[0] = v; p[1] = v >> 8; p[2] = v >> 16; p[3] = v >> 24;
}
static uint32_t get32(const unsigned char *p) {
  return p[0] | (p[1] << 8) | ((uint32_t)p[2] << 16) | ((uint32_t)p[3] << 24);
}

int cdb_make_start(struct cdb_make *m, int fd) {
  m->fd = fd; m->recs = NULL; m->n = 0; m->cap = 0; m->pos = 2048;
  return (int)lseek(fd, 2048, SEEK_SET) == 2048 ? 0 : -1;
}

int cdb_make_add(struct cdb_make *m, const void *key, unsigned klen,
                 const void *val, unsigned vlen) {
  unsigned char hdr[8];
  if (m->n == m->cap) {
    m->cap = m->cap ? m->cap * 2 : 64;
    m->recs = realloc(m->recs, m->cap * sizeof(*m->recs));
    if (!m->recs) return -1;
  }
  struct cdb_make_record *r = &m->recs[m->n++];
  r->klen = klen; r->vlen = vlen; r->hash = cdb_hash(key, klen);
  r->pos = m->pos;
  r->buf = malloc(klen);
  memcpy(r->buf, key, klen);
  put32(hdr, klen); put32(hdr + 4, vlen);
  if (wr(m->fd, hdr, 8) || wr(m->fd, key, klen) || wr(m->fd, val, vlen))
    return -1;
  m->pos += 8 + klen + vlen;
  return 0;
}

int cdb_make_finish(struct cdb_make *m) {
  unsigned char ptr[2048];
  unsigned counts[256];
  memset(counts, 0, sizeof(counts));
  for (unsigned i = 0; i < m->n; i++) counts[m->recs[i].hash & 255]++;
  uint32_t pos = m->pos;
  for (unsigned t = 0; t < 256; t++) {
    unsigned ncells = counts[t] * 2;
    put32(ptr + t * 8, pos);
    put32(ptr + t * 8 + 4, ncells);
    if (!ncells) continue;
    unsigned char *cells = calloc(ncells, 8);
    for (unsigned i = 0; i < m->n; i++) {
      if ((m->recs[i].hash & 255) != (unsigned)t) continue;
      uint32_t slot = (m->recs[i].hash >> 8) % ncells;
      while (get32(cells + slot * 8 + 4)) slot = (slot + 1) % ncells;
      put32(cells + slot * 8, m->recs[i].hash);
      put32(cells + slot * 8 + 4, m->recs[i].pos);
    }
    if (wr(m->fd, cells, (size_t)ncells * 8)) { free(cells); return -1; }
    free(cells);
    pos += ncells * 8;
  }
  if (lseek(m->fd, 0, SEEK_SET) != 0) return -1;
  if (wr(m->fd, ptr, 2048)) return -1;
  for (unsigned i = 0; i < m->n; i++) free(m->recs[i].buf);
  free(m->recs);
  return 0;
}

static int rd_at(int fd, off_t off, void *buf, size_t n) {
  if (lseek(fd, off, SEEK_SET) != off) return -1;
  char *p = buf;
  while (n) {
    ssize_t r = read(fd, p, n);
    if (r <= 0) return -1;
    p += r; n -= r;
  }
  return 0;
}

int cdb_seek(int fd, const void *key, unsigned klen, unsigned *dlenp) {
  unsigned char hdr[8], tbl[8];
  uint32_t h = cdb_hash(key, klen);
  if (rd_at(fd, (h & 255) * 8, tbl, 8)) return -1;
  uint32_t tpos = get32(tbl), ncells = get32(tbl + 4);
  if (!ncells) return 0;
  uint32_t slot = (h >> 8) % ncells;
  char kbuf[4096];
  for (uint32_t i = 0; i < ncells; i++) {
    uint32_t s = (slot + i) % ncells;
    unsigned char cell[8];
    if (rd_at(fd, tpos + (off_t)s * 8, cell, 8)) return -1;
    uint32_t ch = get32(cell), cpos = get32(cell + 4);
    if (!cpos) return 0;                 /* empty cell: not found */
    if (ch != h) continue;
    if (rd_at(fd, cpos, hdr, 8)) return -1;
    uint32_t rk = get32(hdr), rv = get32(hdr + 4);
    if (rk != klen || rk > sizeof(kbuf)) continue;
    if (rd_at(fd, cpos + 8, kbuf, rk)) return -1;
    if (memcmp(kbuf, key, klen)) continue;
    *dlenp = rv;                          /* fd now positioned at value */
    return 1;
  }
  return 0;
}

int cdb_bread(int fd, void *buf, int len) {
  char *p = buf;
  while (len > 0) {
    ssize_t r = read(fd, p, len);
    if (r <= 0) return -1;
    p += r; len -= (int)r;
  }
  return 0;
}

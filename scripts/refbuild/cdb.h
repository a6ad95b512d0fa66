/* mini-cdb: just enough of the tinycdb old-style API for recur-nn-io.c
   (the image lacks libcdb).  Format-compatible with djb cdb. */
#ifndef MINI_CDB_H
#define MINI_CDB_H
#include <stdint.h>
#include <sys/types.h>

struct cdb_make_record {
  char *buf;            /* klen,vlen,key,val packed */
  uint32_t klen, vlen;
  uint32_t hash;
  uint32_t pos;
};

struct cdb_make {
  int fd;
  struct cdb_make_record *recs;
  unsigned n, cap;
  uint32_t pos;
};

int cdb_make_start(struct cdb_make *m, int fd);
int cdb_make_add(struct cdb_make *m, const void *key, unsigned klen,
                 const void *val, unsigned vlen);
int cdb_make_finish(struct cdb_make *m);

/* old fd-based query interface: cdb_seek positions fd at the value */
int cdb_seek(int fd, const void *key, unsigned klen, unsigned *dlenp);
int cdb_bread(int fd, void *buf, int len);
#endif

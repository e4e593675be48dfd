// Sanitizer harness for the native engine (SURVEY §5: the reference ships
// no sanitizers; we build the hot C++ under ASan/UBSan and the threaded
// parse under TSan — see tests/test_native_sanitizers.py).
//
// Usage: sanitize_main <gaf> <meta.bin> <gfa> <threads>
//   meta.bin = packed graph tensors dumped by the test (little-endian):
//   n_nodes, n_edges, rc_base, total_slots, dense (5×i64), then
//   ids[i64×N], node_len[i32×N], edge_key[u64×E], il_base[i64×N],
//   ol_base[i64×N].

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <unistd.h>
#include <vector>

#include "gafcov.cpp"

int main(int argc, char **argv) {
  if (argc < 5) {
    fprintf(stderr, "usage: %s GAF META GFA THREADS\n", argv[0]);
    return 2;
  }
  FILE *meta = fopen(argv[2], "rb");
  if (!meta) return 2;
  int64_t n_nodes, n_edges, rc_base, total_slots, dense;
  if (fread(&n_nodes, 8, 1, meta) != 1 || fread(&n_edges, 8, 1, meta) != 1 ||
      fread(&rc_base, 8, 1, meta) != 1 || fread(&total_slots, 8, 1, meta) != 1 ||
      fread(&dense, 8, 1, meta) != 1)
    return 2;
  std::vector<int64_t> ids(n_nodes), ilb(n_nodes), olb(n_nodes);
  std::vector<int32_t> nlen(n_nodes);
  std::vector<uint64_t> ek(n_edges);
  if (fread(ids.data(), 8, n_nodes, meta) != (size_t)n_nodes) return 2;
  if (fread(nlen.data(), 4, n_nodes, meta) != (size_t)n_nodes) return 2;
  if (fread(ek.data(), 8, n_edges, meta) != (size_t)n_edges) return 2;
  if (fread(ilb.data(), 8, n_nodes, meta) != (size_t)n_nodes) return 2;
  if (fread(olb.data(), 8, n_nodes, meta) != (size_t)n_nodes) return 2;
  fclose(meta);

  void *h = gafcov_create(n_nodes, ids.data(), nlen.data(), ek.data(), n_edges,
                          ilb.data(), olb.data(), rc_base, total_slots,
                          (int)dense);
  int threads = atoi(argv[4]);
  int64_t n = threads > 1
                  ? gafcov_process_file_mt(h, argv[1], 20, 0.1, threads)
                  : gafcov_process_file(h, argv[1], 20, 0.1);
  if (n < 0) return 3;

  int fd = open("/dev/null", O_WRONLY);
  if (fd < 0) return 2;
  int64_t rc = gafcov_emit(h, argv[3], fd);
  close(fd);
  gafcov_destroy(h);
  printf("lines=%lld emit_rc=%lld\n", (long long)n, (long long)rc);
  return rc == 0 ? 0 : 4;
}

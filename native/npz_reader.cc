// Native npz (zip-of-npy) reader: the data-loader core of the framework.
//
// The reference's data layer re-opens compressed npz files through Python's
// zipfile on every window access (ref utils.py:383-400 via np.load). This
// library provides the native equivalent the rebuild's feature-bank builder
// uses: mmap'd zip parsing, zlib inflate straight into caller-provided
// buffers (zero Python-object overhead per chunk), and a pthread pool for
// loading many videos concurrently.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).
//
// Supported: zip entries stored (method 0) or deflated (method 8); .npy
// v1/v2 headers; little-endian dtypes f2/f4/f8/i1/i2/i4/i8/u1/u2/u4/u8/b1.
// Zip64 is supported for the common "large entry" case via the extra field.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <pthread.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <vector>
#include <zlib.h>

namespace {

#pragma pack(push, 1)
struct EOCD {
  uint32_t sig;            // 0x06054b50
  uint16_t disk, cd_disk, n_disk, n_total;
  uint32_t cd_size, cd_offset;
  uint16_t comment_len;
};
struct CDEntry {
  uint32_t sig;            // 0x02014b50
  uint16_t ver_made, ver_need, flags, method, mtime, mdate;
  uint32_t crc, comp_size, uncomp_size;
  uint16_t name_len, extra_len, comment_len, disk_start, int_attr;
  uint32_t ext_attr, local_offset;
};
struct LocalHeader {
  uint32_t sig;            // 0x04034b50
  uint16_t ver, flags, method, mtime, mdate;
  uint32_t crc, comp_size, uncomp_size;
  uint16_t name_len, extra_len;
};
#pragma pack(pop)

struct ArrayEntry {
  std::string name;        // member name without ".npy"
  uint16_t method;
  uint32_t crc = 0;        // CRC-32 of the uncompressed member (from the CD)
  uint64_t comp_size;
  uint64_t data_offset;    // offset of compressed payload in file
  // parsed .npy metadata (filled lazily)
  int dtype_code = -1;     // see kDtypeTable
  int ndim = 0;
  int64_t shape[8] = {0};
  uint64_t payload_offset = 0;  // bytes of .npy header to skip
  uint64_t nbytes = 0;
  bool parsed = false;
};

struct NpzFile {
  int fd = -1;
  const uint8_t* map = nullptr;
  size_t size = 0;
  std::vector<ArrayEntry> arrays;
  std::string error;
};

// dtype codes aligned with the Python wrapper
struct DtypeInfo { const char* descr; int code; int itemsize; };
const DtypeInfo kDtypeTable[] = {
    {"<f4", 0, 4}, {"<f8", 1, 8}, {"<f2", 2, 2}, {"<i4", 3, 4},
    {"<i8", 4, 8}, {"<i2", 5, 2}, {"<i1", 6, 1}, {"|i1", 6, 1},
    {"<u4", 7, 4}, {"<u8", 8, 8}, {"<u2", 9, 2}, {"|u1", 10, 1},
    {"<u1", 10, 1}, {"|b1", 11, 1},
};

int dtype_code_for(const std::string& descr, int* itemsize) {
  for (const auto& d : kDtypeTable) {
    if (descr == d.descr) {
      *itemsize = d.itemsize;
      return d.code;
    }
  }
  return -1;
}

// Resolve zip64 placeholders. Per APPNOTE 4.5.3 the zip64 extra field holds
// 8-byte values ONLY for the 32-bit fields that are 0xFFFFFFFF, in the fixed
// order (uncomp_size, comp_size, local_offset, disk_start) — so the byte
// position of e.g. the offset depends on WHICH other fields overflowed.
// (An archive >4GB of small members stores only the offset, at position 0.)
void resolve_zip64(const uint8_t* extra, uint16_t extra_len, uint64_t* uncomp,
                   uint64_t* comp, uint64_t* local_off) {
  const uint8_t* p = extra;
  const uint8_t* end = extra + extra_len;
  while (p + 4 <= end) {
    uint16_t id, sz;
    memcpy(&id, p, 2);
    memcpy(&sz, p + 2, 2);
    p += 4;
    if (end - p < sz) return;  // torn extra field
    if (id == 0x0001) {
      const uint8_t* q = p;
      const uint8_t* qend = p + sz;
      uint64_t* fields[3] = {uncomp, comp, local_off};
      for (uint64_t* f : fields) {
        if (*f != 0xFFFFFFFFull) continue;  // not a placeholder: not stored
        if (qend - q < 8) return;           // declared but missing: keep FFFF
        memcpy(f, q, 8);
        q += 8;
      }
      return;
    }
    p += sz;
  }
}

bool parse_npy_header(NpzFile* f, ArrayEntry* e, const uint8_t* buf,
                      size_t buf_len) {
  if (buf_len < 10 || memcmp(buf, "\x93NUMPY", 6) != 0) {
    f->error = "bad npy magic in member " + e->name;
    return false;
  }
  uint8_t major = buf[6];
  uint32_t header_len;
  size_t header_start;
  if (major == 1) {
    uint16_t hl;
    memcpy(&hl, buf + 8, 2);
    header_len = hl;
    header_start = 10;
  } else {
    memcpy(&header_len, buf + 8, 4);
    header_start = 12;
  }
  if (header_start + header_len > buf_len) {
    f->error = "truncated npy header in " + e->name;
    return false;
  }
  std::string hdr(reinterpret_cast<const char*>(buf + header_start), header_len);

  auto find_value = [&](const char* key) -> std::string {
    size_t k = hdr.find(key);
    if (k == std::string::npos) return "";
    size_t c = hdr.find(':', k);
    return hdr.substr(c + 1);
  };

  // descr
  std::string after = find_value("'descr'");
  size_t q1 = after.find('\'');
  size_t q2 = after.find('\'', q1 + 1);
  std::string descr = after.substr(q1 + 1, q2 - q1 - 1);
  int itemsize = 0;
  e->dtype_code = dtype_code_for(descr, &itemsize);
  if (e->dtype_code < 0) {
    f->error = "unsupported dtype " + descr + " in " + e->name;
    return false;
  }

  // fortran_order must be False (numpy save default)
  if (find_value("'fortran_order'").find("True") != std::string::npos &&
      hdr.find("'shape': ()") == std::string::npos) {
    // fortran order only matters for ndim >= 2
  }

  // shape tuple
  std::string sh = find_value("'shape'");
  size_t p1 = sh.find('(');
  size_t p2 = sh.find(')');
  std::string inner = sh.substr(p1 + 1, p2 - p1 - 1);
  e->ndim = 0;
  uint64_t total = 1;
  const char* s = inner.c_str();
  while (*s) {
    while (*s == ' ' || *s == ',') s++;
    if (!*s) break;
    char* endp;
    long long v = strtoll(s, &endp, 10);
    if (endp == s) break;
    e->shape[e->ndim++] = v;
    total *= (uint64_t)v;
    s = endp;
  }
  e->payload_offset = header_start + header_len;
  e->nbytes = total * (uint64_t)itemsize;
  e->parsed = true;
  return true;
}

// Inflate just the first ``want`` bytes of a deflated member (enough for the
// .npy header); early-exits without decompressing the payload.
bool member_prefix(NpzFile* f, ArrayEntry* e, std::vector<uint8_t>* scratch,
                   const uint8_t** out_ptr, uint64_t* out_len,
                   uint64_t want = 64 * 1024) {
  const uint8_t* comp = f->map + e->data_offset;
  if (e->method == 0) {
    *out_ptr = comp;
    *out_len = e->comp_size;
    return true;
  }
  scratch->resize(want);
  z_stream zs;
  memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, -MAX_WBITS) != Z_OK) return false;
  // feed input in uInt-safe chunks (comp_size can exceed 4GB under zip64)
  uint64_t in_left = e->comp_size;
  const uint8_t* in_p = comp;
  zs.next_out = scratch->data();
  zs.avail_out = (uInt)want;
  int rc = Z_OK;
  while (zs.avail_out > 0 && (in_left > 0 || rc == Z_OK)) {
    if (zs.avail_in == 0) {
      if (in_left == 0) break;
      uInt chunk = in_left > 0x40000000u ? 0x40000000u : (uInt)in_left;
      zs.next_in = const_cast<uint8_t*>(in_p);
      zs.avail_in = chunk;
      in_p += chunk;
      in_left -= chunk;
    }
    rc = inflate(&zs, Z_NO_FLUSH);
    if (rc == Z_STREAM_END) break;
    if (rc != Z_OK && rc != Z_BUF_ERROR) break;
    if (rc == Z_BUF_ERROR && zs.avail_in > 0) break;  // stuck: corrupt stream
  }
  uint64_t produced = want - zs.avail_out;
  inflateEnd(&zs);
  if (rc != Z_STREAM_END && rc != Z_OK && rc != Z_BUF_ERROR) return false;
  if (produced == 0) return false;
  *out_ptr = scratch->data();
  *out_len = produced;
  return true;
}

// Inflate the member with the .npy header bytes routed to a small scratch
// and the array payload streamed DIRECTLY into ``dst`` (no intermediate
// full-member buffer).
bool inflate_payload_to(NpzFile* f, ArrayEntry* e, uint8_t* dst) {
  const uint8_t* comp = f->map + e->data_offset;
  if (e->method == 0) {
    // the npy header's claimed payload must fit inside the zip member
    if (e->payload_offset > e->comp_size ||
        e->nbytes > e->comp_size - e->payload_offset)
      return false;
    // CRC over the whole stored member (bit flips in incompressible data
    // are format-valid; only the CRC catches them — numpy's zipfile checks
    // it, and the corrupt-skip contract needs errors, not silent garbage)
    uLong crc = crc32(0L, Z_NULL, 0);
    uint64_t left = e->comp_size;
    const uint8_t* q = comp;
    while (left > 0) {
      uInt chunk = left > 0x40000000u ? 0x40000000u : (uInt)left;
      crc = crc32(crc, q, chunk);
      q += chunk;
      left -= chunk;
    }
    if ((uint32_t)crc != e->crc) return false;
    memcpy(dst, comp + e->payload_offset, e->nbytes);
    return true;
  }
  z_stream zs;
  memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, -MAX_WBITS) != Z_OK) return false;
  // Stream both sides in uInt-safe chunks: comp_size AND nbytes can exceed
  // 4GB (zip64 feature-bank caches), and zlib counters are 32-bit.
  uint64_t in_left = e->comp_size;
  const uint8_t* in_p = comp;
  std::vector<uint8_t> hdr(e->payload_offset);
  uint64_t out_done = 0;             // across hdr then payload
  const uint64_t out_total = e->payload_offset + e->nbytes;
  uLong crc = crc32(0L, Z_NULL, 0);  // over the full uncompressed member
  int rc = Z_OK;
  while (out_done < out_total) {
    if (zs.avail_in == 0) {
      if (in_left == 0) break;
      uInt chunk = in_left > 0x40000000u ? 0x40000000u : (uInt)in_left;
      zs.next_in = const_cast<uint8_t*>(in_p);
      zs.avail_in = chunk;
      in_p += chunk;
      in_left -= chunk;
    }
    if (zs.avail_out == 0) {
      if (out_done < e->payload_offset) {
        zs.next_out = hdr.data() + out_done;
        zs.avail_out = (uInt)(e->payload_offset - out_done);
      } else {
        uint64_t left = out_total - out_done;
        uInt chunk = left > 0x40000000u ? 0x40000000u : (uInt)left;
        zs.next_out = dst + (out_done - e->payload_offset);
        zs.avail_out = chunk;
      }
    }
    uint64_t before = zs.total_out;
    uint8_t* out_start = zs.next_out;
    rc = inflate(&zs, Z_NO_FLUSH);
    uint64_t produced = zs.total_out - before;
    crc = crc32(crc, out_start, (uInt)produced);
    out_done += produced;
    if (rc == Z_STREAM_END) break;
    if (rc != Z_OK && rc != Z_BUF_ERROR) break;
    if (rc == Z_BUF_ERROR && zs.avail_in > 0 && zs.avail_out > 0) break;
  }
  inflateEnd(&zs);
  return out_done == out_total && (uint32_t)crc == e->crc;
}

}  // namespace

extern "C" {

void* npz_open(const char* path) {
  NpzFile* f = new NpzFile();
  f->fd = open(path, O_RDONLY);
  if (f->fd < 0) {
    delete f;
    return nullptr;
  }
  struct stat st;
  fstat(f->fd, &st);
  f->size = st.st_size;
  f->map = static_cast<const uint8_t*>(
      mmap(nullptr, f->size, PROT_READ, MAP_PRIVATE, f->fd, 0));
  if (f->map == MAP_FAILED) {
    close(f->fd);
    delete f;
    return nullptr;
  }

  // locate EOCD (scan back over optional comment)
  const size_t max_back = std::min(f->size, (size_t)(65536 + 22));
  size_t eocd_off = 0;
  bool found = false;
  for (size_t i = 22; i <= max_back; ++i) {
    size_t off = f->size - i;
    uint32_t sig;
    memcpy(&sig, f->map + off, 4);
    if (sig == 0x06054b50) {
      eocd_off = off;
      found = true;
      break;
    }
  }
  if (!found) {
    munmap(const_cast<uint8_t*>(f->map), f->size);
    close(f->fd);
    delete f;
    return nullptr;
  }
  EOCD eocd;
  memcpy(&eocd, f->map + eocd_off, sizeof(EOCD));
  uint64_t cd_off = eocd.cd_offset;
  uint64_t n_entries = eocd.n_total;
  if (eocd.cd_offset == 0xFFFFFFFF || eocd.n_total == 0xFFFF) {
    // zip64 EOCD locator sits right before EOCD
    if (eocd_off >= 20) {
      uint32_t lsig;
      memcpy(&lsig, f->map + eocd_off - 20, 4);
      if (lsig == 0x07064b50) {
        uint64_t z64_eocd_off;
        memcpy(&z64_eocd_off, f->map + eocd_off - 20 + 8, 8);
        if (z64_eocd_off + 56 <= f->size) {
          memcpy(&n_entries, f->map + z64_eocd_off + 32, 8);
          memcpy(&cd_off, f->map + z64_eocd_off + 48, 8);
        }
      }
    }
  }

  // Every offset below is validated against the mmap size: a truncated or
  // torn archive must surface as open-failure / skipped members, never as
  // an out-of-bounds read (the manifest layer's corrupt-npz-skip contract,
  // ref utils.py:292-294, relies on errors rather than crashes).
  uint64_t p = cd_off;
  for (uint64_t i = 0; i < n_entries; ++i) {
    if (p + sizeof(CDEntry) > f->size) break;
    CDEntry cd;
    memcpy(&cd, f->map + p, sizeof(CDEntry));
    if (cd.sig != 0x02014b50) break;
    uint64_t rec_len = sizeof(CDEntry) + (uint64_t)cd.name_len +
                       cd.extra_len + cd.comment_len;
    if (p + rec_len > f->size) break;
    std::string name(reinterpret_cast<const char*>(f->map + p + sizeof(CDEntry)),
                     cd.name_len);
    const uint8_t* extra = f->map + p + sizeof(CDEntry) + cd.name_len;
    uint64_t uncomp = cd.uncomp_size;
    uint64_t comp = cd.comp_size;
    uint64_t local_off = cd.local_offset;
    resolve_zip64(extra, cd.extra_len, &uncomp, &comp, &local_off);
    p += rec_len;

    // local header to find the data offset
    if (local_off + sizeof(LocalHeader) > f->size) continue;
    LocalHeader lh;
    memcpy(&lh, f->map + local_off, sizeof(LocalHeader));
    if (lh.sig != 0x04034b50) continue;
    uint64_t data_off =
        local_off + sizeof(LocalHeader) + lh.name_len + lh.extra_len;
    if (data_off > f->size || comp > f->size - data_off) continue;

    ArrayEntry e;
    e.name = name.size() > 4 && name.substr(name.size() - 4) == ".npy"
                 ? name.substr(0, name.size() - 4)
                 : name;
    e.method = cd.method;
    e.crc = cd.crc;
    e.comp_size = comp;
    e.data_offset = data_off;
    f->arrays.push_back(std::move(e));
  }
  return f;
}

int npz_num_arrays(void* h) {
  return h ? (int)static_cast<NpzFile*>(h)->arrays.size() : -1;
}

// info: [dtype_code, ndim, shape[0..7], nbytes] as int64[10]; name copied to
// name_out (cap name_cap)
int npz_get_info(void* h, int idx, int64_t* info, char* name_out,
                 int name_cap) {
  NpzFile* f = static_cast<NpzFile*>(h);
  if (!f || idx < 0 || idx >= (int)f->arrays.size()) return -1;
  ArrayEntry* e = &f->arrays[idx];
  if (!e->parsed) {
    std::vector<uint8_t> scratch;
    const uint8_t* ptr;
    uint64_t len;
    if (!member_prefix(f, e, &scratch, &ptr, &len)) return -2;
    if (!parse_npy_header(f, e, ptr, len)) return -3;
  }
  info[0] = e->dtype_code;
  info[1] = e->ndim;
  for (int i = 0; i < 8; ++i) info[2 + i] = e->shape[i];
  snprintf(name_out, name_cap, "%s", e->name.c_str());
  return 0;
}

int64_t npz_nbytes(void* h, int idx) {
  NpzFile* f = static_cast<NpzFile*>(h);
  if (!f || idx < 0 || idx >= (int)f->arrays.size()) return -1;
  ArrayEntry* e = &f->arrays[idx];
  if (!e->parsed) {
    int64_t info[10];
    char tmp[8];
    if (npz_get_info(h, idx, info, tmp, sizeof(tmp)) != 0) return -1;
  }
  return (int64_t)e->nbytes;
}

int npz_read(void* h, int idx, void* dst) {
  NpzFile* f = static_cast<NpzFile*>(h);
  if (!f || idx < 0 || idx >= (int)f->arrays.size()) return -1;
  ArrayEntry* e = &f->arrays[idx];
  if (!e->parsed) {
    std::vector<uint8_t> scratch;
    const uint8_t* ptr;
    uint64_t len;
    if (!member_prefix(f, e, &scratch, &ptr, &len)) return -2;
    if (!parse_npy_header(f, e, ptr, len)) return -3;
  }
  if (!inflate_payload_to(f, e, static_cast<uint8_t*>(dst))) return -4;
  return 0;
}

void npz_close(void* h) {
  NpzFile* f = static_cast<NpzFile*>(h);
  if (!f) return;
  munmap(const_cast<uint8_t*>(f->map), f->size);
  close(f->fd);
  delete f;
}

// ---------------- threaded multi-file prefetch -------------------------

struct LoadJob {
  const char* path;
  // out
  void* handle;
};

struct Pool {
  LoadJob* jobs;
  int n_jobs;
  int next;
  pthread_mutex_t mu;
};

static void* pool_worker(void* arg) {
  Pool* pool = static_cast<Pool*>(arg);
  for (;;) {
    pthread_mutex_lock(&pool->mu);
    int i = pool->next++;
    pthread_mutex_unlock(&pool->mu);
    if (i >= pool->n_jobs) break;
    pool->jobs[i].handle = npz_open(pool->jobs[i].path);
  }
  return nullptr;
}

// open many npz files in parallel; handles_out[i] = handle or NULL
int npz_open_many(const char** paths, int n, void** handles_out, int n_threads) {
  std::vector<LoadJob> jobs(n);
  for (int i = 0; i < n; ++i) jobs[i] = {paths[i], nullptr};
  Pool pool{jobs.data(), n, 0, PTHREAD_MUTEX_INITIALIZER};
  int nt = n_threads < 1 ? 1 : n_threads;
  std::vector<pthread_t> threads(nt);
  for (int t = 0; t < nt; ++t)
    pthread_create(&threads[t], nullptr, pool_worker, &pool);
  for (int t = 0; t < nt; ++t) pthread_join(threads[t], nullptr);
  int ok = 0;
  for (int i = 0; i < n; ++i) {
    handles_out[i] = jobs[i].handle;
    if (jobs[i].handle) ok++;
  }
  return ok;
}

}  // extern "C"

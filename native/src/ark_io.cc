#include "ark_io.h"

#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Header {
  std::string key;
  char token[8];
};

bool ReadKey(FILE* f, std::string* key) {
  key->clear();
  int c;
  while ((c = fgetc(f)) != EOF) {
    if (c == ' ' || c == '\t' || c == '\n') {
      if (!key->empty()) return true;
      continue;  // skip leading whitespace
    }
    key->push_back(static_cast<char>(c));
  }
  return !key->empty();
}

bool ExpectBinary(FILE* f) {
  int a = fgetc(f);
  int b = fgetc(f);
  return a == 0 && b == 'B';
}

bool ReadToken(FILE* f, std::string* tok) {
  tok->clear();
  int c;
  while ((c = fgetc(f)) != EOF) {
    if (c == ' ') return true;
    tok->push_back(static_cast<char>(c));
  }
  return false;
}

bool ReadInt32(FILE* f, int32_t* v) {
  int size = fgetc(f);
  if (size != 4) return false;
  return fread(v, 4, 1, f) == 1;
}

}  // namespace

struct PkcArkReader {
  FILE* f = nullptr;
  // pending payload description
  int64_t rows = 0, cols = 0, n = 0;
  bool is_double = false;
};

extern "C" {

PkcArkReader* pkc_ark_open(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  auto* r = new PkcArkReader();
  r->f = f;
  return r;
}

void pkc_ark_close(PkcArkReader* r) {
  if (!r) return;
  if (r->f) fclose(r->f);
  delete r;
}

int pkc_ark_next_mat_header(PkcArkReader* r, char* key_buf, int key_buf_len,
                            int64_t* rows, int64_t* cols) {
  std::string key, tok;
  if (!ReadKey(r->f, &key)) return 0;
  if (!ExpectBinary(r->f)) return -1;
  if (!ReadToken(r->f, &tok)) return -1;
  if (tok == "FM")
    r->is_double = false;
  else if (tok == "DM")
    r->is_double = true;
  else
    return -1;  // compressed matrices go through the Python path
  int32_t m, n;
  if (!ReadInt32(r->f, &m) || !ReadInt32(r->f, &n)) return -1;
  r->rows = m;
  r->cols = n;
  snprintf(key_buf, key_buf_len, "%s", key.c_str());
  *rows = m;
  *cols = n;
  return 1;
}

int pkc_ark_read_mat_data(PkcArkReader* r, float* out) {
  const int64_t count = r->rows * r->cols;
  if (!r->is_double) {
    return fread(out, sizeof(float), count, r->f) ==
                   static_cast<size_t>(count)
               ? 1
               : -1;
  }
  std::vector<double> tmp(count);
  if (fread(tmp.data(), sizeof(double), count, r->f) !=
      static_cast<size_t>(count))
    return -1;
  for (int64_t i = 0; i < count; ++i) out[i] = static_cast<float>(tmp[i]);
  return 1;
}

int pkc_ark_next_vec_header(PkcArkReader* r, char* key_buf, int key_buf_len,
                            int64_t* n) {
  std::string key;
  if (!ReadKey(r->f, &key)) return 0;
  if (!ExpectBinary(r->f)) return -1;
  int32_t len;
  if (!ReadInt32(r->f, &len)) return -1;
  r->n = len;
  snprintf(key_buf, key_buf_len, "%s", key.c_str());
  *n = len;
  return 1;
}

int pkc_ark_read_vec_data(PkcArkReader* r, int32_t* out) {
  for (int64_t i = 0; i < r->n; ++i) {
    int size = fgetc(r->f);
    if (size != 4) return -1;
    if (fread(&out[i], 4, 1, r->f) != 1) return -1;
  }
  return 1;
}

int pkc_ark_write_mat(const char* path, const char* key, const float* data,
                      int64_t rows, int64_t cols) {
  FILE* f = fopen(path, "ab");
  if (!f) return -1;
  fprintf(f, "%s ", key);
  fputc(0, f);
  fputc('B', f);
  fputs("FM ", f);
  int32_t m = static_cast<int32_t>(rows), n = static_cast<int32_t>(cols);
  fputc(4, f);
  fwrite(&m, 4, 1, f);
  fputc(4, f);
  fwrite(&n, 4, 1, f);
  fwrite(data, sizeof(float), rows * cols, f);
  fclose(f);
  return 1;
}

}  // extern "C"

// Native Kaldi-format ark I/O (C ABI).
//
// Fast streaming reader/writer for binary float-matrix and int-vector
// archives — the native replacement for the subprocess pipes the
// reference uses (ref: data_io.py:18-22) on the hot chunk-loading path.
// Exposed through ctypes from pytorch_kaldi_cgs_tpu/native.py.

#ifndef PKC_NATIVE_ARK_IO_H_
#define PKC_NATIVE_ARK_IO_H_

#include <cstdint>

extern "C" {

// Opaque reader over an ark file. Iterates (key, float32 matrix) or
// (key, int32 vector) entries.
typedef struct PkcArkReader PkcArkReader;

PkcArkReader* pkc_ark_open(const char* path);
void pkc_ark_close(PkcArkReader* r);

// Advance to the next matrix entry. Returns 1 on success, 0 at EOF,
// -1 on format error. Key is written into key_buf (<= key_buf_len incl.
// NUL); rows/cols describe the upcoming matrix.
int pkc_ark_next_mat_header(PkcArkReader* r, char* key_buf, int key_buf_len,
                            int64_t* rows, int64_t* cols);
// Copy the current matrix payload (row-major float32) into out.
int pkc_ark_read_mat_data(PkcArkReader* r, float* out);

// Advance to the next int-vector entry; n receives its length.
int pkc_ark_next_vec_header(PkcArkReader* r, char* key_buf, int key_buf_len,
                            int64_t* n);
int pkc_ark_read_vec_data(PkcArkReader* r, int32_t* out);

// One-shot writer: append "key <mat>" to path (creates file if needed).
int pkc_ark_write_mat(const char* path, const char* key, const float* data,
                      int64_t rows, int64_t cols);

}  // extern "C"

#endif  // PKC_NATIVE_ARK_IO_H_

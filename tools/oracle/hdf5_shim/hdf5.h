/* Minimal HDF5 1.14 API shim — lets the reference FluSI tools
 * (/root/reference/src/flusi) build against h5py's bundled
 * libhdf5-*.so.310 in an image with no HDF5 development headers.
 *
 * Declarations are transcribed from the public, stable HDF5 1.14 API
 * (H5public.h / H5{F,P,T,S,D,A,L,O}public.h signatures); only the
 * surface the reference actually uses is declared.  ABI correctness is
 * not taken on faith: tests/test_flusi.py round-trips files between
 * these reference-built binaries and our io/flusi.py both ways and
 * byte-compares payloads, which would fail loudly on any mismatch.
 */
#ifndef WR_HDF5_SHIM_H
#define WR_HDF5_SHIM_H

#include <stdint.h>
#include <stddef.h>
#include <time.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef int herr_t;
typedef int64_t hid_t;
typedef uint64_t hsize_t;
typedef int htri_t;

herr_t H5open(void);
herr_t H5close(void);
#define H5OPEN H5open(),

/* ---- H5F ---- */
#define H5F_ACC_RDONLY 0x0000u
#define H5F_ACC_RDWR 0x0001u
#define H5F_ACC_TRUNC 0x0002u
hid_t H5Fcreate(const char *filename, unsigned flags, hid_t fcpl_id,
                hid_t fapl_id);
hid_t H5Fopen(const char *filename, unsigned flags, hid_t fapl_id);
herr_t H5Fclose(hid_t file_id);

/* ---- H5P ---- */
#define H5P_DEFAULT ((hid_t)0)
extern hid_t H5P_CLS_DATASET_CREATE_ID_g;
extern hid_t H5P_CLS_FILE_ACCESS_ID_g;
#define H5P_DATASET_CREATE (H5OPEN H5P_CLS_DATASET_CREATE_ID_g)
#define H5P_FILE_ACCESS (H5OPEN H5P_CLS_FILE_ACCESS_ID_g)
hid_t H5Pcreate(hid_t cls_id);
herr_t H5Pclose(hid_t plist_id);
herr_t H5Pset_fapl_stdio(hid_t fapl_id);
herr_t H5Pset_chunk(hid_t plist_id, int ndims, const hsize_t dim[]);
herr_t H5Pset_fill_value(hid_t plist_id, hid_t type_id, const void *value);
typedef enum H5D_alloc_time_t {
  H5D_ALLOC_TIME_ERROR = -1,
  H5D_ALLOC_TIME_DEFAULT = 0,
  H5D_ALLOC_TIME_EARLY = 1,
  H5D_ALLOC_TIME_LATE = 2,
  H5D_ALLOC_TIME_INCR = 3
} H5D_alloc_time_t;
herr_t H5Pset_alloc_time(hid_t plist_id, H5D_alloc_time_t alloc_time);

/* ---- H5T (native type globals, resolved after H5open) ---- */
extern hid_t H5T_NATIVE_DOUBLE_g;
extern hid_t H5T_NATIVE_FLOAT_g;
extern hid_t H5T_NATIVE_INT_g;
extern hid_t H5T_NATIVE_UCHAR_g;
extern hid_t H5T_NATIVE_ULONG_g;
#define H5T_NATIVE_DOUBLE (H5OPEN H5T_NATIVE_DOUBLE_g)
#define H5T_NATIVE_FLOAT (H5OPEN H5T_NATIVE_FLOAT_g)
#define H5T_NATIVE_INT (H5OPEN H5T_NATIVE_INT_g)
#define H5T_NATIVE_UCHAR (H5OPEN H5T_NATIVE_UCHAR_g)
#define H5T_NATIVE_ULONG (H5OPEN H5T_NATIVE_ULONG_g)

/* ---- H5S ---- */
#define H5S_ALL ((hid_t)0)
hid_t H5Screate_simple(int rank, const hsize_t dims[],
                       const hsize_t maxdims[]);
herr_t H5Sclose(hid_t space_id);

/* ---- H5D ---- */
hid_t H5Dcreate2(hid_t loc_id, const char *name, hid_t type_id,
                 hid_t space_id, hid_t lcpl_id, hid_t dcpl_id,
                 hid_t dapl_id);
hid_t H5Dopen2(hid_t loc_id, const char *name, hid_t dapl_id);
herr_t H5Dclose(hid_t dset_id);
herr_t H5Dread(hid_t dset_id, hid_t mem_type_id, hid_t mem_space_id,
               hid_t file_space_id, hid_t dxpl_id, void *buf);
herr_t H5Dwrite(hid_t dset_id, hid_t mem_type_id, hid_t mem_space_id,
                hid_t file_space_id, hid_t dxpl_id, const void *buf);

/* ---- H5A ---- */
hid_t H5Acreate2(hid_t loc_id, const char *attr_name, hid_t type_id,
                 hid_t space_id, hid_t acpl_id, hid_t aapl_id);
hid_t H5Aopen(hid_t obj_id, const char *attr_name, hid_t aapl_id);
htri_t H5Aexists(hid_t obj_id, const char *attr_name);
hid_t H5Aget_space(hid_t attr_id);
herr_t H5Aread(hid_t attr_id, hid_t type_id, void *buf);
herr_t H5Awrite(hid_t attr_id, hid_t type_id, const void *buf);
herr_t H5Aclose(hid_t attr_id);

/* ---- H5L ---- */
htri_t H5Lexists(hid_t loc_id, const char *name, hid_t lapl_id);

/* ---- H5O (visit3 ABI; the 5-arg H5Ovisit maps like the 1.14 default) */
typedef enum H5_index_t {
  H5_INDEX_UNKNOWN = -1,
  H5_INDEX_NAME = 0,
  H5_INDEX_CRT_ORDER = 1,
  H5_INDEX_N = 2
} H5_index_t;
typedef enum H5_iter_order_t {
  H5_ITER_UNKNOWN = -1,
  H5_ITER_INC = 0,
  H5_ITER_DEC = 1,
  H5_ITER_NATIVE = 2,
  H5_ITER_N = 3
} H5_iter_order_t;
typedef enum H5O_type_t {
  H5O_TYPE_UNKNOWN = -1,
  H5O_TYPE_GROUP = 0,
  H5O_TYPE_DATASET = 1,
  H5O_TYPE_NAMED_DATATYPE = 2,
  H5O_TYPE_MAP = 3,
  H5O_TYPE_NTYPES = 4
} H5O_type_t;
#define H5O_MAX_TOKEN_SIZE 16
typedef struct H5O_token_t {
  uint8_t __data[H5O_MAX_TOKEN_SIZE];
} H5O_token_t;
typedef struct H5O_info2_t {
  unsigned long fileno;
  H5O_token_t token;
  H5O_type_t type;
  unsigned rc;
  time_t atime;
  time_t mtime;
  time_t ctime;
  time_t btime;
  hsize_t num_attrs;
} H5O_info2_t;
typedef H5O_info2_t H5O_info_t;
typedef herr_t (*H5O_iterate2_t)(hid_t obj, const char *name,
                                 const H5O_info2_t *info, void *op_data);
herr_t H5Ovisit3(hid_t obj_id, H5_index_t idx_type, H5_iter_order_t order,
                 H5O_iterate2_t op, void *op_data, unsigned fields);
#define H5O_INFO_BASIC 0x0001u
#define H5Ovisit(o, i, ord, op, data) H5Ovisit3(o, i, ord, op, data, \
                                                H5O_INFO_BASIC)

#ifdef __cplusplus
}
#endif

#endif /* WR_HDF5_SHIM_H */

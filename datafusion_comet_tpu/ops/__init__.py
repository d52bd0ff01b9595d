"""Public device-kernel surface: the TPU op library behind the engine.

The engine's operators (exec/operators/) compose these kernels; they are
re-exported here as the stable, individually-usable op API — the analog of
the reference's spark-expr kernel crate being a standalone library
(/root/reference/native/spark-expr/src/lib.rs: "can be used from any
DataFusion-based project"). Everything here is jit-safe (static shapes, no
host callbacks) unless its docstring says otherwise.

Layout:
- sort/grouping limbs:   column_limbs, order_limbs, lexsort, grouping_limbs
- join/shuffle hashing:  murmur3/xxhash64 live in exec.evaluator (hash_columns)
- string/bytes kernels:  bytes_funcs (hex/base64/digests/conv/bin), json_path
- decimal:               decimal_wide (two-limb i128 storage + arithmetic)
- parquet decode:        decode (bit-unpack, RLE/dict pages on device)
- random:                random_xorshift (Spark-exact rand/randn/sampling)
- pallas:                pallas_kernels (fused bucket-count histogram)
- float formatting:      ryu (Java shortest-repr double/float -> chars),
                         format_number (grouped fixed-decimal rendering)
- string split/regexp:   split_device (split/split_part/substring_index/
                         soundex), regex_extract (extract/extract_all/
                         replace position chains), regex_dfa (rlike)
- parquet page index:    pageindex (hand-parsed ColumnIndex/OffsetIndex)
- iceberg write:         iceberg_write (snapshot append + O_EXCL commit)
"""

from datafusion_comet_tpu.exec import bytes_funcs, decimal_wide, decode
from datafusion_comet_tpu.exec import json_path, pallas_kernels, random_xorshift, sortkeys
from datafusion_comet_tpu.exec.decode import (
    decode_list_column_chunk,
    decode_rle_hybrid_device,
    decode_string_dict_column_chunk,
    scan_list_levels,
    unpack_bits_device,
)
from datafusion_comet_tpu.exec.format_number import format_grouped, scale_to_int
from datafusion_comet_tpu.exec.regex_extract import (
    extract_all_device,
    extract_device,
    linearize,
    replace_device,
)
from datafusion_comet_tpu.exec.split_device import (
    soundex_device,
    split_device,
    split_part_device,
    substring_index_device,
)
from datafusion_comet_tpu.exec.json_path import device_get_json_object, parse_path
from datafusion_comet_tpu.exec.pallas_kernels import bucket_count, bucket_sum, pallas_available
from datafusion_comet_tpu.exec.random_xorshift import (
    init_seed_host,
    rand_column,
    randn_column,
)
from datafusion_comet_tpu.exec import ryu
from datafusion_comet_tpu.exec.ryu import double_to_string, float_to_string, shortest_digits
from datafusion_comet_tpu.io import pageindex
from datafusion_comet_tpu.io.pageindex import compute_page_masks, read_page_index
from datafusion_comet_tpu.io import iceberg_write
from datafusion_comet_tpu.exec.decode import decode_byte_stream_split, decode_delta_binary_device
from datafusion_comet_tpu.exec.sortkeys import (
    column_limbs,
    grouping_limbs,
    lexsort,
    order_limbs,
)

__all__ = [
    "bytes_funcs",
    "decimal_wide",
    "decode",
    "json_path",
    "pallas_kernels",
    "random_xorshift",
    "sortkeys",
    "column_limbs",
    "order_limbs",
    "lexsort",
    "grouping_limbs",
    "device_get_json_object",
    "parse_path",
    "bucket_count",
    "pallas_available",
    "unpack_bits_device",
    "decode_rle_hybrid_device",
    "init_seed_host",
    "rand_column",
    "randn_column",
    "ryu",
    "double_to_string",
    "float_to_string",
    "shortest_digits",
    "pageindex",
    "read_page_index",
    "compute_page_masks",
    "iceberg_write",
    "decode_byte_stream_split",
    "decode_delta_binary_device",
    "decode_list_column_chunk",
    "decode_string_dict_column_chunk",
    "scan_list_levels",
    "bucket_sum",
    "format_grouped",
    "scale_to_int",
    "extract_device",
    "extract_all_device",
    "replace_device",
    "linearize",
    "split_device",
    "split_part_device",
    "substring_index_device",
    "soundex_device",
]

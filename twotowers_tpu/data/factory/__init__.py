"""Dataset factory: MS MARCO readers, samplers, converters, synthetics.

Public surface mirrors the reference's ``dataset_factory/__init__.py:1-44``
so reference users find every entry point; internals are a fresh,
seed-deterministic design (closures take explicit RNGs, builders return
DataFrames instead of writing global state).
"""

from .build_dataset import build_triplets, write_genealogy
from .convert import (
    convert_dataset_format,
    convert_triplets_to_pairs,
    transform_and_save_dataset,
)
from .readers import (
    DATA_DIR,
    PROCESSED_DATA_DIR,
    RAW_DATA_DIR,
    RAW_PARQUET_DIR,
    convert_tsv_to_parquet,
    get_ms_marco_dataset,
    load_split,
    load_synthetic_tsv,
    save_dataset_as_parquet,
    setup_data_dirs,
)
from .selectors import (
    answer_in_text,
    build_inter_query_pool,
    classic_positives,
    high_ngram_overlap,
    intra_query_zero_filtered,
    ngram_set,
    random_inter_query,
)
from .synthetic import (
    expand_synthetic_dataset,
    generate_synthetic_pairs,
    write_pairs_tsv,
    write_triplets_parquet,
)

__all__ = [
    "DATA_DIR",
    "PROCESSED_DATA_DIR",
    "RAW_DATA_DIR",
    "RAW_PARQUET_DIR",
    "answer_in_text",
    "build_inter_query_pool",
    "build_triplets",
    "classic_positives",
    "convert_dataset_format",
    "convert_triplets_to_pairs",
    "convert_tsv_to_parquet",
    "expand_synthetic_dataset",
    "generate_synthetic_pairs",
    "get_ms_marco_dataset",
    "high_ngram_overlap",
    "intra_query_zero_filtered",
    "load_split",
    "load_synthetic_tsv",
    "ngram_set",
    "random_inter_query",
    "save_dataset_as_parquet",
    "setup_data_dirs",
    "transform_and_save_dataset",
    "write_genealogy",
    "write_pairs_tsv",
    "write_triplets_parquet",
]

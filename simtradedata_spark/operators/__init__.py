from simtradedata_spark.operators.asof import asof_join  # noqa: F401
from simtradedata_spark.operators.align import forward_fill, align_to_calendar  # noqa: F401
from simtradedata_spark.operators.resample import resample_ohlc  # noqa: F401
from simtradedata_spark.operators.topk import top_k, top_k_per_group  # noqa: F401
from simtradedata_spark.operators.dedup import (  # noqa: F401
    dedup_exact,
    keep_last,
    minhash_signatures,
    minhash_lsh_candidates,
    simhash,
    ngram_jaccard_pairs,
)
from simtradedata_spark.operators.windows import trailing_n, moving_avg, cumulative_product  # noqa: F401
from simtradedata_spark.operators.similarity import cosine_top_k, lsh_bucket_top_k  # noqa: F401

from aproximacion_1_etl_spark.text.dedup import (  # noqa: F401
    exact_dedup,
    word_shingles,
    minhash_signatures,
    minhash_candidate_pairs,
    simhash,
    ngram_jaccard_pairs,
)
from aproximacion_1_etl_spark.text.analysis import (  # noqa: F401
    token_count,
    regex_token_count,
    lang_id,
    quality_score,
    fingerprint,
)
from aproximacion_1_etl_spark.text.vector import (  # noqa: F401
    cosine_sim,
    ann_topk_bruteforce,
    ann_topk_lsh,
    embedding_near_dup,
)

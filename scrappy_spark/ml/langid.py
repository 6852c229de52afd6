"""Learned language ID: hashed char-n-gram multinomial Naive Bayes.

The marker heuristic (``operators/textstats.py::lang_id``) only knows
the languages in its hand-written stopword table and scores zero on
any text without those exact tokens — learned systems instead weight
hashed character n-grams (Cavnar & Trenkle 1994 n-gram categorization;
Joulin et al. 2016 fastText hashing). This module is that design kept
hermetic: a deterministic in-repo sentence corpus, an MLlib multinomial
Naive Bayes over hashed char-{1,2}-gram counts, and scan-side scoring
through a BROADCAST weight table — no UDF in the inference path, every
cross-row reduction integer.

Model choice, measured (ARCHITECTURE.md r9): on this corpus size
(~12 sentences/language) discriminative logistic regression MEMORIZES
— LBFGS zeroes the shared common-gram evidence and loads rare
per-sentence grams (held-out accuracy 0.13–0.4 across intercept and
regularization settings), while generative NB uses every gram's
smoothed class likelihood and scores 1.0 held-out. NB's log-prob
scoring is also exactly the linear form the scan-side scorer wants
(score = Σ cnt·log p(gram|lang) + log prior) and its fit is
closed-form — deterministic by construction, no optimizer state.

Split of labor (the pq_train precedent):

- TRAINING is bounded driver-side work — the corpus is a module
  constant (~60 sentences), so collecting its feature vectors and
  fitting MLlib NaiveBayes costs nothing at any corpus scale and keeps
  the model a pure function of (sentences, smoothing);
- FEATURES and INFERENCE are fully distributed: char trigrams are
  sliced scan-side (``substr`` + md5 bucket — the same expression the
  DuckDB oracle runs, so the feature stage is hash-checkable), counts
  join the broadcast micro-snapped weights, and the per-doc argmax is
  one partial-agg groupBy + deterministic tie-break.

Reference parity: none — the reference has no language ID at all; this
upgrades the text-analysis extension family (VERDICT r8 #6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

#: hashed feature space (buckets) and n-gram widths (multiple widths,
#: fastText-style: 1-grams carry script and letter frequency, 2-grams
#: the orthography)
LANGID_BUCKETS = 4096
LANGID_NS = (1, 2)

#: deterministic training corpus — independently authored sentences,
#: ~12 per language. zh is the language the marker heuristic cannot
#: see at all (no zh row in LANG_MARKERS).
LANGID_SENTENCES: list[tuple[str, str]] = [
    ("the weather this morning is cold and clear", "en"),
    ("she walked to the market to buy fresh bread", "en"),
    ("our train leaves early in the morning", "en"),
    ("he is reading a long book about history", "en"),
    ("the children are playing in the garden", "en"),
    ("we should finish this work before dinner", "en"),
    ("that old house near the river is empty", "en"),
    ("they often travel to the coast in summer", "en"),
    ("my sister teaches mathematics at the school", "en"),
    ("the library closes at nine in the evening", "en"),
    ("a quiet street runs behind the station", "en"),
    ("good coffee makes the morning much better", "en"),
    ("das wetter ist heute morgen kalt und klar", "de"),
    ("sie ging zum markt um frisches brot zu kaufen", "de"),
    ("unser zug faehrt frueh am morgen ab", "de"),
    ("er liest ein langes buch ueber geschichte", "de"),
    ("die kinder spielen draussen im garten", "de"),
    ("wir sollten diese arbeit vor dem abendessen beenden", "de"),
    ("das alte haus am fluss steht leer", "de"),
    ("sie reisen im sommer oft an die kueste", "de"),
    ("meine schwester unterrichtet mathematik an der schule", "de"),
    ("die bibliothek schliesst um neun uhr abends", "de"),
    ("eine ruhige strasse liegt hinter dem bahnhof", "de"),
    ("guter kaffee macht den morgen viel besser", "de"),
    ("el tiempo esta frio y despejado esta manana", "es"),
    ("ella fue al mercado a comprar pan fresco", "es"),
    ("nuestro tren sale temprano por la manana", "es"),
    ("el esta leyendo un libro largo sobre historia", "es"),
    ("los ninos juegan en el jardin", "es"),
    ("debemos terminar este trabajo antes de la cena", "es"),
    ("esa casa vieja junto al rio esta vacia", "es"),
    ("ellos viajan a la costa en verano", "es"),
    ("mi hermana ensena matematicas en la escuela", "es"),
    ("la biblioteca cierra a las nueve de la noche", "es"),
    ("una calle tranquila pasa detras de la estacion", "es"),
    ("un buen cafe mejora mucho la manana", "es"),
    ("le temps est froid et clair ce matin", "fr"),
    ("elle est allee au marche acheter du pain frais", "fr"),
    ("notre train part tot le matin", "fr"),
    ("il lit un long livre sur l histoire", "fr"),
    ("les enfants jouent dans le jardin", "fr"),
    ("nous devons finir ce travail avant le diner", "fr"),
    ("cette vieille maison pres de la riviere est vide", "fr"),
    ("ils voyagent souvent sur la cote en ete", "fr"),
    ("ma soeur enseigne les mathematiques a l ecole", "fr"),
    ("la bibliotheque ferme a neuf heures du soir", "fr"),
    ("une rue calme passe derriere la gare", "fr"),
    ("un bon cafe rend le matin bien meilleur", "fr"),
    ("今天早上的天气又冷又晴朗", "zh"),
    ("她去市场买新鲜的面包", "zh"),
    ("我们的火车一大早就出发", "zh"),
    ("他正在读一本关于历史的长书", "zh"),
    ("孩子们在花园里玩耍", "zh"),
    ("我们应该在晚饭前完成这项工作", "zh"),
    ("河边那栋老房子是空的", "zh"),
    ("他们夏天经常去海边旅行", "zh"),
    ("我姐姐在学校教数学", "zh"),
    ("图书馆晚上九点关门", "zh"),
    ("车站后面有一条安静的街道", "zh"),
    ("好咖啡让早晨好得多", "zh"),
]

#: held-out sentences (disjoint from training) for the accuracy pin
LANGID_HELDOUT: list[tuple[str, str]] = [
    ("the museum opens late on sunday afternoons", "en"),
    ("a warm wind came in from the sea", "en"),
    ("please bring the letters to the office", "en"),
    ("das museum oeffnet sonntags erst spaet", "de"),
    ("ein warmer wind kam vom meer herein", "de"),
    ("bitte bring die briefe ins buero", "de"),
    ("el museo abre tarde los domingos", "es"),
    ("un viento calido llego desde el mar", "es"),
    ("por favor lleva las cartas a la oficina", "es"),
    ("le musee ouvre tard le dimanche", "fr"),
    ("un vent chaud est venu de la mer", "fr"),
    ("apporte les lettres au bureau s il te plait", "fr"),
    ("博物馆星期天很晚才开门", "zh"),
    ("一阵暖风从海上吹来", "zh"),
    ("请把信件带到办公室", "zh"),
]

LANGID_LABELS = ("de", "en", "es", "fr", "zh")  # alphabetical


def char_gram_buckets(
    text: Column,
    ns: tuple[int, ...] = LANGID_NS,
    buckets: int = LANGID_BUCKETS,
) -> Column:
    """Array of hashed char-n-gram bucket ids of ``lower(text)``, all
    widths in ``ns`` concatenated — the feature expression, shared
    verbatim (via its SQL twin) with the DuckDB oracle: bucket =
    first-8-hex of md5(gram) mod ``buckets``. Pure codegen (transform
    over a position sequence), no UDF."""
    t = F.lower(text)
    m = F.length(t)

    def leg(n: int) -> Column:
        # single-arg lambda via a closure: a `lambda q, n=n` default
        # would make PySpark see TWO parameters and bind the element
        # INDEX to n (transform's optional second argument) — every
        # first gram became md5('') before this was a factory.
        return F.when(
            m >= n,
            F.transform(
                F.sequence(F.lit(1), m - n + 1),
                lambda q: F.conv(
                    F.substring(F.md5(t.substr(q, F.lit(n))), 1, 8), 16, 10
                ).cast("long")
                % buckets,
            ),
        ).otherwise(F.array().cast("array<long>"))

    out = leg(ns[0])
    for n in ns[1:]:
        out = F.concat(out, leg(n))
    return out


def _raw_char_grams(
    text: Column, ns: tuple[int, ...] = LANGID_NS
) -> Column:
    """Array of raw char-n-gram SLICES of ``text`` (already lowered by
    the caller), all widths in ``ns`` concatenated — the un-hashed half
    of :func:`char_gram_buckets`. Hashing happens on the exploded
    column instead of inside this transform lambda: lambda bodies are
    evaluated per element without whole-stage codegen, so moving the
    md5→conv chain out of the lambda measured ~2× on the gram stage
    (and keeping ``lower()`` OUT of the lambda avoids re-lowering the
    full document once per gram — O(len²) per doc)."""
    m = F.length(text)

    def leg(n: int) -> Column:
        # single-arg lambda via a closure (see char_gram_buckets).
        return F.when(
            m >= n,
            F.transform(
                F.sequence(F.lit(1), m - n + 1),
                lambda q: text.substr(q, F.lit(n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    out = leg(ns[0])
    for n in ns[1:]:
        out = F.concat(out, leg(n))
    return out


def _bucket_of(gram: Column, buckets: int = LANGID_BUCKETS) -> Column:
    """bucket = first-8-hex of md5(gram) mod ``buckets`` — the same
    value :func:`char_gram_buckets` computes (shared with the DuckDB
    oracle), applied to an already-sliced gram column."""
    return (
        F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
        % buckets
    )


def doc_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ns: tuple[int, ...] = LANGID_NS,
    buckets: int = LANGID_BUCKETS,
) -> DataFrame:
    """(id, bucket, cnt) hashed char-n-gram counts, scan-side. The
    explode follows the generate-pushdown rule (outer + null filter on
    the generated column).

    Plan shape (optimization r14): ``ensure_parallelism`` spreads the
    single-row-group fixture scan across cores BEFORE the CPU-heavy
    gram stage (the _lgram_stage precedent — AQE cannot split a
    one-task scan, and this stage is ~L× the scan bytes in CPU);
    ``lower(text)`` is projected ONCE per row instead of re-evaluating
    inside the per-gram transform lambda; and the md5→conv bucket hash
    runs on the exploded flat column (codegen) rather than inside the
    lambda (interpreted). Same (id, bucket, cnt) multiset, measured
    9.4 s → 0.4 s on the sf0.1 gram stage."""
    from ..operators.mining import ensure_parallelism

    lowered = ensure_parallelism(
        df.select(F.col(id_col), F.col(text_col))
    ).select(id_col, F.lower(F.col(text_col)).alias("__lt"))
    return (
        lowered.select(
            id_col,
            F.explode_outer(_raw_char_grams(F.col("__lt"), ns=ns)).alias(
                "__g"
            ),
        )
        .filter(F.col("__g").isNotNull())
        .select(id_col, _bucket_of(F.col("__g"), buckets=buckets).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def train_lang_id(
    spark: SparkSession,
    sentences: list[tuple[str, str]] | None = None,
    buckets: int = LANGID_BUCKETS,
    ns: tuple[int, ...] = LANGID_NS,
    smoothing: float = 1.0,
    micro: int = 1_000_000,
) -> tuple[DataFrame, DataFrame]:
    """Fit multinomial Naive Bayes over the hashed char-n-gram counts
    of the in-repo sentence corpus; returns broadcastable
    ``(weights, intercepts)`` frames with INTEGER micro-snapped
    log-probabilities — ``weights(lang, bucket, w_micro)`` =
    round(log p(bucket|lang)·1e6) for every (lang, bucket) (Laplace-
    smoothed, hence dense) and ``intercepts(lang, b_micro)`` = the log
    class priors — so distributed scoring sums are BIGINT-exact and
    the per-doc argmax cannot drift with partitioning.

    The fit itself is bounded driver-side work (the corpus is a module
    constant; the pq_train precedent) — feature vectors are assembled
    in Python and the closed-form NB fit runs on ~60 rows.
    """
    from pyspark.ml.classification import NaiveBayes
    from pyspark.ml.linalg import Vectors

    data = sentences if sentences is not None else LANGID_SENTENCES
    labels = sorted({lg for _, lg in data})
    feats = doc_features(
        spark.createDataFrame(
            [(i, t) for i, (t, _) in enumerate(data)], "doc_id long, text string"
        ),
        ns=ns,
        buckets=buckets,
    ).collect()  # bounded: the constant training corpus
    by_doc: dict[int, dict[int, float]] = {}
    for r in feats:
        by_doc.setdefault(r["doc_id"], {})[int(r["bucket"])] = float(r["cnt"])
    rows = [
        (
            float(labels.index(lg)),
            Vectors.sparse(buckets, sorted(by_doc.get(i, {}).items())),
        )
        for i, (_, lg) in enumerate(data)
    ]
    train = spark.createDataFrame(rows, ["label", "features"])
    nb = NaiveBayes(modelType="multinomial", smoothing=float(smoothing))
    model = nb.fit(train)
    theta = model.theta  # (numClasses, buckets) log p(bucket|class)
    w_rows = [
        (lg, b, int(round(theta[c, b] * micro)))
        for c, lg in enumerate(labels)
        for b in range(buckets)
    ]
    i_rows = [
        (lg, int(round(model.pi[c] * micro))) for c, lg in enumerate(labels)
    ]
    # JVM local relations (functions/localrel.py): both tables are
    # broadcast into the scan-side scoring join — as Python-RDD
    # relations every evaluation paid per-slice Python-worker
    # round-trips (guide §4); as LocalTableScans they are free.
    from ..functions.localrel import local_relation

    weights = local_relation(
        spark, w_rows, "lang string, bucket long, w_micro long"
    )
    intercepts = local_relation(spark, i_rows, "lang string, b_micro long")
    return weights, intercepts


def lang_id_learned(
    df: DataFrame,
    weights: DataFrame,
    intercepts: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ns: tuple[int, ...] = LANGID_NS,
    buckets: int = LANGID_BUCKETS,
    with_checksum: bool = False,
) -> DataFrame:
    """Scan-side learned language ID: hashed-trigram counts ⋈ broadcast
    micro weights, one partial-agg sum per (doc, lang), deterministic
    argmax (score desc, lang asc). Docs with no n-gram at all (shorter
    than ``n``) predict 'und' with zero margin.

    Output: ``(id, pred_lang, top_micro, margin_micro, n_grams)`` —
    margin is top1 − top2 in exact integer micro units. With
    ``with_checksum=True`` a ``bucket_checksum`` column
    (Σ bucket·cnt, 0 for 'und' docs) rides the SAME per-doc aggregate,
    so audit consumers (q_lang_id_scored) get the hashed feature
    stream's checksum without a second gram pass.

    Requires a DENSE weights table (a row for every (lang, bucket) —
    what :func:`train_lang_id`'s Laplace smoothing produces): the
    scoring join is inner on ``bucket``, so with a sparse
    caller-supplied table a doc whose grams all hash to absent buckets
    would drop out of the output instead of scoring zero.
    """
    # Optimization r14: the per-(doc, lang) shape — broadcast join
    # fanning every (doc, bucket) row ×|langs|, a (doc, lang) groupBy,
    # a crossJoin with the intercepts, a left join, and TWO window
    # passes for the top-2 — collapsed into ONE pass: the weight table
    # pivots to a per-bucket lang→w_micro map (broadcast,
    # model-sized), each (doc, bucket, cnt) row joins it once, and a
    # single groupBy(id) computes n_grams plus one integer dot per
    # lang as parallel aggregate columns (guide §2.3 "aggregate before
    # you shuffle": the shuffle carries |langs| longs per doc instead
    # of |langs| rows per (doc, bucket)). The argmax/margin come from
    # array_sort over the |langs| scores — no window, no second
    # consumption of the gram stage (the old `scored`/`base` split
    # evaluated doc_features twice). Same deterministic tie-break
    # (score desc, lang asc), same integer arithmetic, same output.
    #
    # The intercepts collect is a bounded one-action probe (|labels|
    # rows — the bucket-probe precedent): the label list is part of
    # the model geometry, not data.
    lang_rows = sorted(
        (r["lang"], int(r["b_micro"])) for r in intercepts.collect()
    )
    labels = [lg for lg, _ in lang_rows]
    feats = doc_features(
        df, text_col=text_col, id_col=id_col, ns=ns, buckets=buckets
    )
    # Pivot to a LABEL-INDEXED ARRAY on the (tiny) broadcast side: a
    # per-lang map lookup in the scan-side aggregate costs O(|langs|)
    # string comparisons per lookup, i.e. O(|langs|²) per (doc, bucket)
    # row across the |langs| dots; __wa[i] is O(1). Measured at sf0.1
    # (5-run min, noop sink): serve leg 1.56 s → 1.35 s. The map→array
    # conversion runs once per bucket row (≤ buckets rows), keeping
    # the map's missing-entry semantics via the same coalesce.
    wmap = F.broadcast(
        weights.groupBy("bucket")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("lang", "w_micro"))
            ).alias("__wm")
        )
        .select(
            "bucket",
            F.array(
                *[
                    F.coalesce(F.col("__wm")[F.lit(lg)], F.lit(0))
                    for lg in labels
                ]
            ).alias("__wa"),
        )
    )
    dots = [
        F.sum(F.col("cnt") * F.col("__wa")[i]).alias(f"__d{i}")
        for i, lg in enumerate(labels)
    ]
    # the audit checksum rides the same aggregate (the join is lossless
    # for a dense weights table — every bucket value has a wmap row),
    # so it costs one extra agg column, not a second gram pass.
    extra = (
        [F.sum(F.col("bucket") * F.col("cnt")).cast("long").alias("bucket_checksum")]
        if with_checksum
        else []
    )
    per_doc = (
        feats.join(wmap, "bucket")
        .groupBy(id_col)
        .agg(F.sum("cnt").cast("long").alias("n_grams"), *dots, *extra)
    )
    # (score desc, lang asc) as one lexicographic struct sort: negated
    # score first, lang second — identical ordering to the old window.
    scored_arr = F.array_sort(
        F.array(
            *[
                F.struct(
                    (-(F.col(f"__d{i}") + F.lit(b))).cast("long").alias("negs"),
                    F.lit(lg).alias("lang"),
                )
                for i, (lg, b) in enumerate(lang_rows)
            ]
        )
    )
    best = per_doc.select(
        id_col,
        scored_arr.alias("__a"),
        "n_grams",
        *(["bucket_checksum"] if with_checksum else []),
    ).select(
        id_col,
        F.col("__a")[0]["lang"].alias("pred_lang"),
        (-F.col("__a")[0]["negs"]).cast("long").alias("top_micro"),
        (
            -F.col("__a")[0]["negs"]
            - F.coalesce(
                -F.col("__a")[1]["negs"],
                F.lit(0),
            )
        )
        .cast("long")
        .alias("margin_micro"),
        "n_grams",
        *(["bucket_checksum"] if with_checksum else []),
    )
    # Gram-free docs never enter `feats`; surface them as 'und'. A doc
    # is gram-free iff its text is shorter than the smallest n (the
    # n-gram sequence for n is empty exactly when len < n; null text
    # counts as length 0) — a scan-side FILTER, not the anti-join
    # against `best` this used to be: the anti-join's probe subtree
    # (best projected to the id) differed from the union's left
    # branch, so runtime exchange reuse could not collapse them and
    # the WHOLE gram+score pipeline evaluated twice per action.
    # Measured at sf0.1 (min-of-3, noop): 3.32 → 1.37 s, outputs
    # identical including empty/null-text docs (r14).
    # length(lower(text)), not length(text): grams are sliced from the
    # LOWERED text, and Unicode one-to-many lowercase mappings (İ → i̇)
    # can change the length — the filter must test the same string the
    # gram stage slices or a doc could appear in both branches / neither
    # (ADVICE r14).
    missing = df.filter(
        F.coalesce(F.length(F.lower(F.col(text_col))), F.lit(0)) < min(ns)
    ).select(id_col)
    return best.unionByName(
        missing.select(
            id_col,
            F.lit("und").alias("pred_lang"),
            F.lit(0).cast("long").alias("top_micro"),
            F.lit(0).cast("long").alias("margin_micro"),
            F.lit(0).cast("long").alias("n_grams"),
            *(
                [F.lit(0).cast("long").alias("bucket_checksum")]
                if with_checksum
                else []
            ),
        )
    )


def learned_segment_scorer(
    weights: DataFrame,
    intercepts: DataFrame,
    ns: tuple[int, ...] = LANGID_NS,
    buckets: int = LANGID_BUCKETS,
):
    """Adapter plugging the learned model into
    ``textstats.segment_lang_profile(scorer=...)``: scores each
    (doc, segment) row independently through :func:`lang_id_learned`
    on a composite key, so the code-switching detector's votes come
    from the learned model instead of the marker table."""

    def scorer(segments: DataFrame) -> DataFrame:
        id_col = [
            c for c in segments.columns if c not in ("__s", "__seg_text")
        ][0]
        keyed = segments.withColumn(
            "__k",
            F.concat_ws(
                ":", F.col(id_col).cast("string"), F.col("__s").cast("string")
            ),
        )
        scored = lang_id_learned(
            keyed.select("__k", "__seg_text"),
            weights,
            intercepts,
            text_col="__seg_text",
            id_col="__k",
            ns=ns,
            buckets=buckets,
        )
        return keyed.join(scored, "__k").select(
            id_col, F.col("pred_lang").alias("__pred")
        )

    return scorer


class LangIdModel:
    """Stored lang-id model: the train-once/serve-many lifecycle for
    :func:`train_lang_id` (VERDICT r9 #3), riding ``SnapshotTable``
    exactly as ``operators/ann_index.py::IvfPqIndex`` does for PQ
    codes. ``train_and_store`` fits once and persists the integer
    micro weight/intercept tables as two snapshot tables plus a
    geometry manifest (meta lands LAST, so ``exists()`` implies a
    complete model — a crash mid-train leaves no readable model);
    ``score`` then runs the scan-side inference against the STORED
    broadcast tables with no training, stamping every row with the
    ``model_version`` it was scored by (the train-version audit
    column: retraining commits a new weights version, so provenance
    of every prediction is on the row). ``segment_scorer`` plugs the
    stored model into ``textstats.segment_lang_profile`` so the
    code-switching detector also serves without retraining.

    Scale shape: both tables are model-sized (|labels|·buckets rows ≈
    20k), broadcast into the scan-side join — the corpus never
    shuffles; training cost is a constant paid once per model
    rotation, not per query (the ~8 s q_lang_id_learned pays
    in-query)."""

    def __init__(self, spark: SparkSession, path: str):
        import os

        from ..sources.snapshots import SnapshotTable

        self.spark = spark
        self.path = path
        self._weights = SnapshotTable(spark, os.path.join(path, "weights"))
        self._intercepts = SnapshotTable(
            spark, os.path.join(path, "intercepts")
        )
        self._meta: dict | None = None

    @property
    def meta(self) -> dict:
        import json
        import os

        if self._meta is None:
            with open(os.path.join(self.path, "meta.json")) as f:
                self._meta = json.load(f)
        return self._meta

    def exists(self) -> bool:
        import os

        return os.path.isfile(os.path.join(self.path, "meta.json"))

    @classmethod
    def train_and_store(
        cls,
        spark: SparkSession,
        path: str,
        sentences: list[tuple[str, str]] | None = None,
        buckets: int = LANGID_BUCKETS,
        ns: tuple[int, ...] = LANGID_NS,
        smoothing: float = 1.0,
        micro: int = 1_000_000,
    ) -> "LangIdModel":
        import json
        import os

        import hashlib

        from ..sources.snapshots import stage_build_params

        model = cls(spark, path)
        weights, intercepts = train_lang_id(
            spark,
            sentences=sentences,
            buckets=buckets,
            ns=ns,
            smoothing=smoothing,
            micro=micro,
        )
        # a retried train reuses tables the crashed attempt already
        # committed (the closed-form fit is deterministic), so the
        # retry cannot bump the model_version every prediction stamps.
        # Reuse is only sound for the SAME fit: params + a training-set
        # fingerprint are staged before the first commit and verified
        # on retry (ADVICE r11 #3 — different buckets/ns/sentences over
        # a crashed attempt's weight tables would score wrongly with
        # no error).
        data = sentences if sentences is not None else LANGID_SENTENCES
        train_fp = hashlib.md5(
            json.dumps(sorted(data)).encode()
        ).hexdigest()
        stage_build_params(
            path,
            {
                "buckets": int(buckets),
                "ns": list(ns),
                "smoothing": float(smoothing),
                "micro": int(micro),
                "train_fp": train_fp,
            },
        )
        if model._weights.current_version() is None:
            model._weights.commit(weights.coalesce(1), "NB micro log-probs")
        if model._intercepts.current_version() is None:
            model._intercepts.commit(
                intercepts.coalesce(1), "NB micro log-priors"
            )
        meta = {
            "buckets": buckets,
            "ns": list(ns),
            "smoothing": smoothing,
            "micro": micro,
            "labels": sorted({lg for _, lg in data}),
            "n_sentences": len(data),
        }
        tmp = os.path.join(path, ".meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.rename(tmp, os.path.join(path, "meta.json"))
        model._meta = meta
        return model

    def version(self) -> int:
        """Train-version: the stored weights table's snapshot version
        (0 for the first fit; each retrain commits the next)."""
        v = self._weights.current_version()
        if v is None:
            raise ValueError(f"LangIdModel at {self.path!r}: no stored model")
        return v

    def weights(self) -> DataFrame:
        return self._weights.read()

    def intercepts(self) -> DataFrame:
        return self._intercepts.read()

    def score(
        self,
        df: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        with_checksum: bool = False,
    ) -> DataFrame:
        """:func:`lang_id_learned` against the STORED tables — no
        training — plus the ``model_version`` audit column."""
        meta = self.meta
        out = lang_id_learned(
            df,
            self.weights(),
            self.intercepts(),
            text_col=text_col,
            id_col=id_col,
            ns=tuple(meta["ns"]),
            buckets=meta["buckets"],
            with_checksum=with_checksum,
        )
        return out.withColumn(
            "model_version", F.lit(self.version()).cast("long")
        )

    def segment_scorer(self):
        """The stored-model counterpart of :func:`learned_segment_scorer`
        for ``segment_lang_profile(scorer=...)``."""
        meta = self.meta
        return learned_segment_scorer(
            self.weights(),
            self.intercepts(),
            ns=tuple(meta["ns"]),
            buckets=meta["buckets"],
        )

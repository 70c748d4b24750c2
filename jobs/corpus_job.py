"""End-to-end training-corpus job: raw pages → clean deduplicated
training documents. The composition a 100 TB data pipeline actually
runs, as one spark-submit entrypoint:

    spark-submit --master <cluster> --py-files dist/engine.zip \\
        jobs/corpus_job.py \\
        --input  /path/to/pages_parquet \\
        --output /path/to/corpus \\
        [--min-quality 0.5] [--min-tokens 5] [--langs en,de] \\
        [--stats /path/to/stats] [--python-parallelism N]

Stages (each narrow or one bounded shuffle):

0. pre-stages  — optional, each BEFORE extraction so excluded pages
                 never pay kernel time: ``--blocklist`` (registered-
                 domain exclusion, broadcast join), ``--host-ranks`` +
                 ``--host-rank-min`` (link-graph PageRank floor, the
                 continuous variant of the blocklist; produce ranks
                 with jobs/linkgraph_job.py), ``--snapshot-collapse``
                 (latest capture per canonical url — multi-crawl
                 inputs), ``--honor-meta`` (drop robots-noindex pages
                 and collapse declared-canonical aliases — the pages'
                 OWN authority declarations, operators/headmeta).
                 ``--outlinks PATH`` writes the host-grain link graph
                 of the RAW input as a side output (the PageRank
                 producer feed); ``--tables PATH`` writes markdown-
                 serialized HTML tables of the raw input
                 (operators/tables — table-structured training data);
                 ``--drop-soft404`` drops error pages served as 200
                 (title/tiny-body phrase screen, operators/softerrors)
                 before they pay kernel time.
1. extract     — HTML → (extracted_text, region_spans, lineage); the
                 shuffle-free mapInPandas kernel path.
2. score       — real char-n-gram language id scored INSIDE the
                 extraction pass (extract_pages(lang_id=True) — one
                 python stage total) + quality as pure column math:
                 narrow, zero shuffle, single linear lineage.
3. filter      — quality/token/lang thresholds: pushable predicates;
                 ``--gopher`` adds the repetition-rule drop stage
                 (still the same narrow pass); ``--entropy-min``,
                 ``--lm-ref``/``--lm-max-bits`` (per-language
                 reference LMs, collected model broadcast) and
                 ``--max-compression`` add the round-3 quality-signal
                 drops — entropy is column math, LM/compression are
                 pass-through mapInPandas appends, ALL in the same
                 linear lineage (no join back, no re-extraction);
                 ``--script-screen`` drops mixed-script documents
                 (operators/scriptmix, pure column math, same pass).
4. exact dedup — keep the canonical (min url) copy per content hash:
                 ONE shuffle on md5(extracted_text); near-dup passes
                 (MinHash LSH) run as a separate offline audit because
                 they need a human-reviewed threshold.
5. write       — training docs + a per-stage accounting table so every
                 dropped document is attributable (the A8/A9 audit
                 discipline applied to the corpus funnel).
6. post-write (optional, each reads the committed parquet rather than
   branching the live DAG — re-extraction is never triggered):
   ``--boilerplate-min-df N`` writes ``<output>_clean`` with
   cross-document frequent lines removed — add ``--preserve-spans``
   to remove frequent REGIONS instead, emitting (url, clean_text,
   REMAPPED region_spans): the clean table then keeps region
   structure (spans slice clean_text exactly) without re-running
   extraction; the line-based variant remains for span-less corpora.
   ``--pack-sequences N`` writes ``<output>_packed`` — the GPT-style
   packed-training-sequence manifest (docs concatenate in frozen
   hashed order, split AT N-token boundaries).
   ``--near-dup-audit`` writes LSH-then-verify candidate pairs;
   ``--decontaminate <bench>`` writes ``<output>_contaminated``
   (eval-set n-gram overlap, broadcast). Span-preserving PII
   scrubbing (functions/pii.redact_pii_spans) composes on either
   clean table; the text-only redact_pii remains for span-less use.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--stats", default=None)
    ap.add_argument(
        "--input-format", choices=("pages", "pdf"), default="pages",
        help="'pages' = canonical (url, html) parquet through the"
        " kernel; 'pdf' = (url, data) PDF blobs through the frozen"
        " text-subset parser (sources/pdf) — language id runs as the"
        " standalone pass, every downstream filter stage is shared",
    )
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--langs", default=None, help="comma list; default: keep all")
    ap.add_argument(
        "--lang-margin",
        type=float,
        default=None,
        help="per-char top-2 log-likelihood gap below which language id"
        " abstains to 'und' (langid frozen step 6; suggested:"
        " operators/langid.DEFAULT_MARGIN=0.1). Off by default — the"
        " pure-argmax behavior of earlier rounds",
    )
    ap.add_argument(
        "--preserve-pre",
        action="store_true",
        help="extract <pre> subtrees with VERBATIM whitespace (kernel"
        " 1.6.0 params.preserve_pre): code blocks keep indentation and"
        " blank lines instead of the collapse-and-join rule",
    )
    ap.add_argument(
        "--gopher",
        action="store_true",
        help="apply the Gopher-style repetition/quality rules"
        " (operators/textstats.gopher_filter defaults) as a drop stage",
    )
    ap.add_argument(
        "--entropy-min",
        type=float,
        default=None,
        help="drop documents whose character entropy (bits) is below"
        " this — the degenerate-text signal (keyboard mash, fills)",
    )
    ap.add_argument(
        "--lm-ref",
        default=None,
        help="parquet of trusted reference documents (text, lang) to"
        " train per-language char-bigram LMs from (CCNet-style);"
        " requires --lm-max-bits",
    )
    ap.add_argument(
        "--lm-max-bits",
        type=float,
        default=None,
        help="drop documents scoring above this bits-per-bigram under"
        " their predicted language's reference LM; docs with no"
        " evidence (sub-2-char, unmodeled lang) are KEPT",
    )
    ap.add_argument(
        "--max-compression",
        type=float,
        default=None,
        help="drop documents whose zlib compression ratio exceeds this"
        " (already-compressed/binary junk; Dolma-style signal)",
    )
    ap.add_argument(
        "--blocklist",
        default=None,
        help="parquet of blocked registered domains (column: domain);"
        " pages whose url's registered domain matches are dropped"
        " before extraction even runs (C4-style exclusion)",
    )
    ap.add_argument(
        "--host-priors",
        action="store_true",
        help="write host-grain content priors (n_docs, mean quality,"
        " top language) to <output>_host_priors after the corpus"
        " commits — the content twin of the link-graph rank prior,"
        " consumable as a next-crawl drop/boost list"
        " (operators/hoststats)",
    )
    ap.add_argument(
        "--card",
        action="store_true",
        help="write a per-language dataset card (doc/token/char counts,"
        " mean + median lengths) to <output>_card after the corpus"
        " commits (post-write pattern: one cheap aggregate scan)",
    )
    ap.add_argument(
        "--count-bpe",
        action="store_true",
        help="meter the corpus in SUBWORD tokens (operators/bpe greedy"
        " longest-match): adds n_bpe_tokens/n_unk_pieces columns and a"
        " kept_bpe_tokens funnel total — pipelines budget compute in"
        " tokenizer tokens, not whitespace words",
    )
    ap.add_argument(
        "--bpe-vocab",
        default=None,
        help="piece table (parquet, or .csv with header; column:"
        " piece) to meter --count-bpe in a REAL tokenizer's"
        " vocabulary instead of the committed toy (operators/"
        "bpe.load_vocab: model-sized collect, case-folded, deduped)",
    )
    ap.add_argument(
        "--quality-clf",
        action="store_true",
        help="learned keep/drop stage (operators/quality_clf hashed"
        " bag-of-tokens logistic model): docs whose round-6 logit is"
        " negative drop; zero-token docs are kept (no evidence); adds"
        " the clf_logit audit column and the dropped_clf funnel count",
    )
    ap.add_argument(
        "--honor-noai",
        action="store_true",
        help="honor the noai/noimageai robots-meta opt-out"
        " (operators/headmeta.with_ai_optout): noai pages drop before"
        " extraction (dropped_noai funnel count); with --image-pairs,"
        " noimageai pages are excluded from the pair harvest",
    )
    ap.add_argument(
        "--drop-soft404",
        action="store_true",
        help="pre-extraction soft-404 screen (operators/softerrors"
        ".soft404_page_stage): pages whose harvested <title> carries an"
        " error phrase, or whose tag-stripped head is tiny AND carries"
        " one, drop before paying kernel time; adds the dropped_soft404"
        " funnel count",
    )
    ap.add_argument(
        "--script-screen",
        action="store_true",
        help="drop mixed-script documents (operators/scriptmix: no"
        " script holds 95% of the letters, 20-letter floor — SEO"
        " cloaking / homoglyph spam / wrong-decode signal); adds the"
        " main_script + main_fraction audit columns and the"
        " dropped_script funnel count",
    )
    ap.add_argument(
        "--tables",
        default=None,
        help="optional path: side-output of GitHub-markdown serialized"
        " HTML tables (operators/tables) harvested from the RAW crawl"
        " before any exclusion — table-structured training data, same"
        " raw-scan discipline as --outlinks",
    )
    ap.add_argument(
        "--image-pairs",
        default=None,
        help="optional path: side-output of (url, image_url, alt_text)"
        " image-text pair candidates (operators/images: <img src alt>"
        " + og:image hero rows, urls resolved) harvested from the RAW"
        " crawl — the multimodal fetch list; same raw-scan discipline"
        " as --outlinks",
    )
    ap.add_argument(
        "--boilerplate-min-df",
        type=int,
        default=None,
        help="remove lines occurring in >= N distinct corpus documents"
        " (C4-style cross-document boilerplate strip); adds clean_text",
    )
    ap.add_argument(
        "--preserve-spans",
        action="store_true",
        help="make --boilerplate-min-df remove frequent REGIONS via"
        " operators/paragraphs.remove_frequent_regions: <output>_clean"
        " then carries REMAPPED region_spans that slice clean_text"
        " exactly (region structure survives cleaning); without this"
        " flag the line-based strip emits span-less clean_text",
    )
    ap.add_argument(
        "--redact-pii",
        action="store_true",
        help="write <output>_redacted: span-preserving PII scrub"
        " (functions/pii.redact_pii_spans) of the furthest-downstream"
        " span-aligned table the job produced — the _clean table when"
        " --preserve-spans ran, else the committed corpus — clean_text"
        " with <EMAIL>/<IP>/<PHONE> tokens plus REMAPPED region_spans,"
        " so scrubbing no longer orphans the span-aligned table",
    )
    ap.add_argument(
        "--diff-prev",
        default=None,
        help="path of the PREVIOUS corpus parquet: adds diff_added/"
        "removed/changed/unchanged counters vs the newly written"
        " corpus (operators/snapshots.corpus_diff, post-write stage)",
    )
    ap.add_argument(
        "--sniff-charset",
        action="store_true",
        help="charset-repair pre-stage: decode legacy/BOM pages to clean"
        " utf-8 before any html-reading stage (functions/charset)",
    )
    ap.add_argument(
        "--sniff-content-type",
        action="store_true",
        help="drop non-html fetch bodies by magic bytes BEFORE"
        " extraction (functions/multimodal.with_content_type): pdfs,"
        " images and archives mislabeled as pages never pay kernel"
        " time; runs AFTER --sniff-charset when both are on, so"
        " utf-16 html is decoded before it is classified",
    )
    ap.add_argument(
        "--snapshot-collapse",
        action="store_true",
        help="collapse multi-crawl inputs to the LATEST capture per"
        " canonical url (functions/urls.latest_snapshot) before"
        " extraction — stale refetches never pay kernel time; adds the"
        " dropped_stale_snapshot funnel count",
    )
    ap.add_argument(
        "--honor-meta",
        action="store_true",
        help="honor the pages' own head declarations BEFORE extraction"
        " (operators/headmeta): drop robots-noindex pages and collapse"
        " pages declaring a <link rel=canonical> elsewhere to one"
        " representative per authoritative url; adds the"
        " dropped_noindex + dropped_canonical_alias funnel counts",
    )
    ap.add_argument(
        "--outlinks",
        default=None,
        help="optional path: write the host-grain link graph"
        " (operators/linkgraph.outlinks -> host_edges) harvested from"
        " the RAW input pages — the producer feed for PageRank host"
        " ranks (jobs/linkgraph_job.py). A second, pure-JVM scan of"
        " (url, html); shares nothing with the extraction lineage",
    )
    ap.add_argument(
        "--feed-links",
        default=None,
        help="optional path: write the feed urls pages advertise in"
        " their heads (operators/headmeta.feed_links) — the discovery"
        " producer for the feed-fetch table operators/feeds harvests"
        " and frontier_job --feeds consumes. Same raw-scan side-output"
        " discipline as --outlinks",
    )
    ap.add_argument(
        "--host-ranks",
        default=None,
        help="parquet of host ranks (node, rank — jobs/linkgraph_job"
        " output); pages on hosts ranking below --host-rank-min drop"
        " BEFORE extraction (link-graph quality prior, the blocklist"
        " shape); unranked hosts are KEPT (no evidence)",
    )
    ap.add_argument(
        "--host-rank-min",
        type=float,
        default=None,
        help="minimum host PageRank to enter extraction; requires"
        " --host-ranks",
    )
    ap.add_argument(
        "--shard-tokens",
        type=int,
        default=None,
        help="write <output>_sharded partitioned by shard_id: token-"
        "balanced training shards of ~N tokens each (operators/"
        "sampling.shard_by_tokens, deterministic hashed-url order);"
        " metered in subword tokens when --count-bpe ran, whitespace"
        " tokens otherwise",
    )
    ap.add_argument(
        "--pack-sequences",
        type=int,
        default=None,
        help="write <output>_packed: the GPT-style packed-training-"
        "sequence manifest (operators/sampling.pack_sequences) over"
        " the written corpus — docs concatenate in frozen hashed order"
        " and split AT N-token sequence boundaries; metered in subword"
        " tokens when --count-bpe ran, whitespace tokens otherwise",
    )
    ap.add_argument(
        "--decontaminate",
        default=None,
        help="optional path: parquet of benchmark/eval documents"
        " (doc_id, text); corpus docs sharing word-5-gram shingles with"
        " it are written to <output>_contaminated for exclusion",
    )
    ap.add_argument(
        "--near-dup-audit",
        default=None,
        help="optional path: write MinHash-LSH candidate pairs over the"
        " final corpus for human-thresholded near-dup review",
    )
    ap.add_argument("--python-parallelism", type=int, default=None)
    args = ap.parse_args()
    if args.preserve_spans and args.boilerplate_min_df is None:
        ap.error("--preserve-spans requires --boilerplate-min-df"
                 " (it selects WHICH boilerplate variant runs)")
    if args.input_format == "pdf":
        for flag, on in (
            ("--sniff-charset", args.sniff_charset),
            ("--sniff-content-type", args.sniff_content_type),
            ("--honor-meta", args.honor_meta),
            ("--snapshot-collapse", args.snapshot_collapse),
            ("--outlinks", args.outlinks is not None),
            ("--feed-links", args.feed_links is not None),
            ("--drop-soft404", args.drop_soft404),
            ("--tables", args.tables is not None),
            ("--image-pairs", args.image_pairs is not None),
            ("--honor-noai", args.honor_noai),
        ):
            if on:
                ap.error(f"{flag} reads html pages and cannot run on"
                         " --input-format pdf")
        # --preserve-spans IS legal on pdf input: BT blocks are real
        # region_spans (sources/pdf.pdf_pages), so the span-preserving
        # boilerplate strip (page headers/footers repeated across a
        # site's PDFs) rebuilds clean text with remapped spans exactly
        # like the HTML lane
    if args.bpe_vocab is not None and not args.count_bpe:
        ap.error("--bpe-vocab requires --count-bpe"
                 " (a vocabulary with no metering stage does nothing)")
    if (args.lm_ref is None) != (args.lm_max_bits is None):
        ap.error("--lm-ref and --lm-max-bits must be given together"
                 " (one alone would silently skip the LM filter stage)")
    if (args.host_ranks is None) != (args.host_rank_min is None):
        ap.error("--host-ranks and --host-rank-min must be given"
                 " together (one alone would silently skip the host-"
                 "rank drop stage)")
    if args.shard_tokens is not None and args.shard_tokens < 1:
        ap.error("--shard-tokens must be >= 1")
    if args.pack_sequences is not None and args.pack_sequences < 1:
        ap.error("--pack-sequences must be >= 1")

    from ocrd_segment_spark.session import submit_session

    spark = submit_session("ocrd-segment-corpus")
    build_corpus(
        spark,
        args.input,
        args.output,
        stats_path=args.stats,
        input_format=args.input_format,
        min_quality=args.min_quality,
        min_tokens=args.min_tokens,
        langs=args.langs.split(",") if args.langs else None,
        lang_margin=args.lang_margin,
        preserve_pre=args.preserve_pre,
        gopher=args.gopher,
        blocklist_path=args.blocklist,
        entropy_min=args.entropy_min,
        lm_ref_path=args.lm_ref,
        lm_max_bits=args.lm_max_bits,
        max_compression=args.max_compression,
        quality_clf=args.quality_clf,
        script_screen=args.script_screen,
        drop_soft404=args.drop_soft404,
        honor_noai=args.honor_noai,
        tables_path=args.tables,
        image_pairs_path=args.image_pairs,
        count_bpe=args.count_bpe,
        bpe_vocab_path=args.bpe_vocab,
        card=args.card,
        host_priors=args.host_priors,
        boilerplate_min_df=args.boilerplate_min_df,
        preserve_spans=args.preserve_spans,
        redact_pii=args.redact_pii,
        decontaminate_path=args.decontaminate,
        near_dup_audit=args.near_dup_audit,
        snapshot_collapse=args.snapshot_collapse,
        sniff_charset=args.sniff_charset,
        sniff_content_type=args.sniff_content_type,
        diff_prev_path=args.diff_prev,
        honor_meta=args.honor_meta,
        outlinks_path=args.outlinks,
        feed_links_path=args.feed_links,
        host_ranks_path=args.host_ranks,
        host_rank_min=args.host_rank_min,
        shard_tokens=args.shard_tokens,
        pack_seq_tokens=args.pack_sequences,
        python_parallelism=args.python_parallelism,
    )
    spark.stop()


def build_corpus(
    spark,
    input_path: str,
    output_path: str,
    stats_path: str | None = None,
    input_format: str = "pages",
    min_quality: float = 0.5,
    min_tokens: int = 5,
    langs: list[str] | None = None,
    lang_margin: float | None = None,
    preserve_pre: bool = False,
    gopher: bool = False,
    blocklist_path: str | None = None,
    entropy_min: float | None = None,
    lm_ref_path: str | None = None,
    lm_max_bits: float | None = None,
    max_compression: float | None = None,
    quality_clf: bool = False,
    script_screen: bool = False,
    drop_soft404: bool = False,
    honor_noai: bool = False,
    tables_path: str | None = None,
    image_pairs_path: str | None = None,
    count_bpe: bool = False,
    bpe_vocab_path: str | None = None,
    card: bool = False,
    host_priors: bool = False,
    boilerplate_min_df: int | None = None,
    preserve_spans: bool = False,
    redact_pii: bool = False,
    decontaminate_path: str | None = None,
    near_dup_audit: str | None = None,
    snapshot_collapse: bool = False,
    sniff_charset: bool = False,
    sniff_content_type: bool = False,
    diff_prev_path: str | None = None,
    honor_meta: bool = False,
    outlinks_path: str | None = None,
    feed_links_path: str | None = None,
    host_ranks_path: str | None = None,
    host_rank_min: float | None = None,
    shard_tokens: int | None = None,
    pack_seq_tokens: int | None = None,
    python_parallelism: int | None = None,
) -> dict:
    """The pipeline body (importable for tests). Returns the funnel
    counts dict that is also written to ``stats_path``."""
    from pyspark.sql import Observation, Window as W, functions as F

    from ocrd_segment_spark.operators.corpus_filters import (
        KEEP_COLS,
        keep_all,
        with_keep_flags,
    )
    from ocrd_segment_spark.pipeline import extract_pages

    pages = spark.read.parquet(input_path)
    n_outlink_edges = -1
    if outlinks_path is not None:
        # host link graph side-output over the RAW crawl (before any
        # exclusion — the graph should see every page, including ones
        # the corpus rejects). A second scan of (url, html) by design:
        # pure-JVM anchor harvesting shares nothing with the
        # extraction lineage, and entangling the two DAGs would force
        # the kernel pass to wait on the edge shuffle. Feeds
        # jobs/linkgraph_job.py / --host-ranks.
        from ocrd_segment_spark.operators.linkgraph import (
            host_edges,
            outlinks,
        )

        edges = host_edges(outlinks(pages))
        e_obs = Observation("outlinks")
        edges = edges.observe(e_obs, F.count(F.lit(1)).alias("n_edges"))
        edges.write.mode("overwrite").parquet(outlinks_path)
        n_outlink_edges = e_obs.get["n_edges"]
    n_feed_links = -1
    if feed_links_path is not None:
        # feed autodiscovery side-output, same raw-scan discipline as
        # --outlinks: the advertised feeds of every crawled page feed
        # the fetch scheduler, whose fetched bodies operators/feeds
        # harvests into frontier_job --feeds
        from ocrd_segment_spark.operators.headmeta import feed_links

        fl = feed_links(pages)
        fl_obs = Observation("feedlinks")
        fl = fl.observe(fl_obs, F.count(F.lit(1)).alias("n"))
        fl.write.mode("overwrite").parquet(feed_links_path)
        n_feed_links = fl_obs.get["n"]
    n_tables = -1
    if tables_path is not None:
        # markdown-table side output, same raw-scan discipline as
        # --outlinks: tables are training data in their own right and
        # should be harvested from every crawled page, including ones
        # the text funnel later rejects (a page can be boilerplate AND
        # carry a good table)
        from ocrd_segment_spark.operators.tables import (
            table_cells,
            tables_markdown,
        )

        md = tables_markdown(table_cells(pages, id_col="url"), id_col="url")
        t_obs = Observation("tables")
        md = md.observe(t_obs, F.count(F.lit(1)).alias("n"))
        md.write.mode("overwrite").parquet(tables_path)
        n_tables = t_obs.get["n"]
    n_image_pairs = -1
    if image_pairs_path is not None:
        # image-text pair side output (operators/images), raw-scan
        # discipline: the multimodal fetch list should see every
        # crawled page — a text-funnel reject can still carry a good
        # captioned image
        from ocrd_segment_spark.operators.images import (
            figure_pairs,
            image_pairs,
            with_caption_quality,
        )

        ip_src = pages
        if honor_noai:
            # noimageai excludes a page from the PAIR harvest even
            # when its text is welcome (and vice versa — the two
            # opt-outs are independent tokens)
            from ocrd_segment_spark.operators.headmeta import (
                with_ai_optout,
            )

            ip_src = (
                with_ai_optout(pages)
                .filter(~F.col("image_ai_optout") & ~F.col("ai_optout"))
                .drop("ai_optout", "image_ai_optout")
            )
        # img + og + figure-caption rows, each screened by the
        # LAION-style caption rule — caption_ok rides the table so the
        # fetch scheduler can prioritize before downloading a byte
        ip = with_caption_quality(
            image_pairs(ip_src).unionByName(figure_pairs(ip_src))
        )
        ip_obs = Observation("imagepairs")
        ip = ip.observe(ip_obs, F.count(F.lit(1)).alias("n"))
        ip.write.mode("overwrite").parquet(image_pairs_path)
        n_image_pairs = ip_obs.get["n"]
    dom_obs = None
    if blocklist_path is not None:
        # domain blocklist BEFORE extraction — blocked pages never pay
        # kernel time; the drop count rides the same terminal write
        # (the Observation sits on the pre-filter node of the one
        # linear lineage, so no extra action or scan exists)
        from ocrd_segment_spark.functions.urls import with_domain_blocked

        bl = spark.read.parquet(blocklist_path)
        flagged = with_domain_blocked(pages, bl)
        dom_obs = Observation("domain")
        flagged = flagged.observe(
            dom_obs,
            F.coalesce(
                F.sum(F.col("blocked").cast("long")), F.lit(0)
            ).alias("dropped_domain"),
        )
        pages = flagged.filter(~F.col("blocked")).drop("blocked", "reg_domain")
    if sniff_charset:
        # charset-repair pre-stage (functions/charset.reencode_non_utf8):
        # placed before every html-reading stage (head_meta harvest and
        # the kernel both see clean utf-8); the clean majority is a
        # pass-through filter, only the legacy/BOM tail pays Python.
        from ocrd_segment_spark.functions.charset import reencode_non_utf8

        pages = reencode_non_utf8(
            pages, python_parallelism=python_parallelism
        ).drop("charset", "charset_source")
    ct_obs = None
    if sniff_content_type:
        # magic-byte ingestion gate (functions/multimodal.
        # with_content_type): only text/html bodies reach the kernel —
        # the blocklist discipline applied to payload TYPE. Placed
        # after charset repair so legacy-encoded html classifies as
        # html, not octet-stream. Scan-stage column math; the drop
        # count rides the terminal write via the Observation.
        from ocrd_segment_spark.functions.multimodal import (
            with_content_type,
        )

        flagged = with_content_type(pages, blob_col="html")
        ct_obs = Observation("ctype")
        flagged = flagged.observe(
            ct_obs,
            F.coalesce(
                F.sum(
                    (
                        F.col("content_type").isNull()
                        | (F.col("content_type") != "text/html")
                    ).cast("long")
                ),
                F.lit(0),
            ).alias("dropped"),
        )
        pages = flagged.filter(F.col("content_type") == "text/html").drop(
            "content_type"
        )
    hr_obs = None
    if host_ranks_path is not None and host_rank_min is not None:
        # link-graph quality prior (the blocklist shape, continuous
        # instead of binary): pages on hosts whose PageRank is below
        # the floor drop BEFORE extraction. Host-grain ranks join on
        # the page host — plain equi-join, AQE broadcasts it when the
        # rank table is small and falls back to a shuffle join at
        # crawl scale (10^8 hosts); unranked hosts are KEPT (absence
        # of link evidence is not negative evidence).
        from ocrd_segment_spark.functions.urls import host_of

        ranks = spark.read.parquet(host_ranks_path).select(
            F.col("node").alias("__hr_host"),
            F.col("rank").alias("__host_rank"),
        )
        d = pages.withColumn("__host", host_of("url")).join(
            ranks, F.col("__host") == F.col("__hr_host"), "left"
        )
        keep_hr = F.col("__host_rank").isNull() | (
            F.col("__host_rank") >= host_rank_min
        )
        hr_obs = Observation("hostrank")
        d = d.observe(
            hr_obs,
            F.coalesce(F.sum((~keep_hr).cast("long")), F.lit(0)).alias(
                "dropped"
            ),
        )
        pages = d.filter(keep_hr).drop("__host", "__hr_host", "__host_rank")
    snap_obs = None
    if snapshot_collapse:
        # multi-crawl collapse: one capture (the latest) per canonical
        # url enters extraction; stale refetches never pay kernel
        # time. One window shuffle on the canonical url — partition
        # sizes are captures-per-page (crawl-count-bounded), and the
        # stale count rides the terminal write via the Observation on
        # the flagged node (flag_col shape of latest_snapshot).
        from ocrd_segment_spark.functions.urls import latest_snapshot

        flagged = latest_snapshot(pages, flag_col="is_latest")
        snap_obs = Observation("snapshot")
        flagged = flagged.observe(
            snap_obs,
            F.coalesce(
                F.sum((~F.col("is_latest")).cast("long")), F.lit(0)
            ).alias("dropped_stale"),
        )
        pages = flagged.filter("is_latest").drop(
            "is_latest", "canonical_url"
        )
    hm_obs = None
    if honor_meta:
        # the page's OWN declarations, honored before extraction:
        # noindex pages drop (compliance, not optimization), and pages
        # whose <link rel=canonical> points elsewhere collapse to one
        # representative per authoritative url. One head_meta harvest
        # (scan-stage column math), noindex counted and filtered FIRST
        # (a noindex alias must never win its group), then the window
        # keep rule; both counts ride the terminal write.
        from ocrd_segment_spark.operators.headmeta import (
            canonical_representatives,
            head_meta,
        )

        m = head_meta(pages)
        hm_obs = Observation("headmeta")
        m = m.observe(
            hm_obs,
            F.coalesce(
                F.sum(F.col("noindex").cast("long")), F.lit(0)
            ).alias("dropped_noindex"),
            F.coalesce(
                F.sum((~F.col("noindex")).cast("long")), F.lit(0)
            ).alias("indexable"),
        )
        reps = canonical_representatives(
            m.filter(~F.col("noindex")),
            flag_col="__canon_rep",
            meta_precomputed=True,
        )
        pages = (
            reps.filter("__canon_rep")
            .drop("__canon_rep", "noindex")
        )
    na_obs = None
    if honor_noai:
        # the page's own AI-training opt-out, honored BEFORE extraction
        # (compliance, not optimization — same placement rationale as
        # --honor-meta's noindex)
        from ocrd_segment_spark.operators.headmeta import with_ai_optout

        flagged = with_ai_optout(pages)
        na_obs = Observation("noai")
        flagged = flagged.observe(
            na_obs,
            F.coalesce(
                F.sum(F.col("ai_optout").cast("long")), F.lit(0)
            ).alias("dropped"),
        )
        pages = flagged.filter(~F.col("ai_optout")).drop(
            "ai_optout", "image_ai_optout"
        )
    sf_obs = None
    if drop_soft404:
        # soft-404 screen LAST in the pre-extraction chain (after the
        # canonical collapse so alias accounting stays exact): error
        # pages served as 200 never pay kernel time. Shared stage with
        # the streaming job (operators/softerrors.soft404_page_stage);
        # the drop count rides the terminal write via the Observation.
        from ocrd_segment_spark.operators.softerrors import (
            soft404_page_stage,
        )

        flagged = soft404_page_stage(pages)
        sf_obs = Observation("soft404")
        flagged = flagged.observe(
            sf_obs,
            F.coalesce(
                F.sum(F.col("is_soft404").cast("long")), F.lit(0)
            ).alias("dropped"),
        )
        pages = flagged.filter(~F.col("is_soft404")).drop("is_soft404")
    # real n-gram language id (round-3 task: the en/de digram toy no
    # longer routes drop decisions) scored INSIDE the extraction pass —
    # same frozen score_document, zero extra Arrow round-trip, the
    # whole scoring chain is ONE python stage + column math
    if input_format == "pdf":
        # the PDF lane: frozen text-subset parse (sources/pdf) into
        # the extracted-table shape, language id as the standalone
        # pass (value-identical to the fused path, pytest-pinned) —
        # still exactly one python codec stage + one scoring stage
        from ocrd_segment_spark.operators.langid import with_lang_ngram
        from ocrd_segment_spark.sources.pdf import pdf_pages

        extracted = with_lang_ngram(
            pdf_pages(pages, python_parallelism=python_parallelism),
            text_col="extracted_text",
            python_parallelism=python_parallelism,
            margin=lang_margin,
        )
    else:
        from ocrd_segment_spark.config import DEFAULT_PARAMS, ExtractParams

        extracted = extract_pages(
            pages,
            # verbatim <pre> (kernel 1.6.0): code blocks keep their
            # indentation in the training corpus; PDF-lane text has no
            # pre analog, so the flag only touches the HTML path
            params=ExtractParams(preserve_pre=True)
            if preserve_pre
            else DEFAULT_PARAMS,
            python_parallelism=python_parallelism,
            lang_id=True,
            lang_margin=lang_margin,
        )
    # the six-stage quality filter chain — ONE shared definition with
    # the streaming job (operators/corpus_filters; review pass 3 found
    # the chain hand-mirrored in both jobs, the exact drift channel
    # that left the stream a round behind). Signal columns stay in the
    # output when their stage is on, so drops are auditable per doc.
    lm_table = None
    if lm_ref_path is not None and lm_max_bits is not None:
        from ocrd_segment_spark.operators.textstats import (
            bigram_lm_models_by_lang,
            collect_lm_surprisal,
        )

        # per-language reference LMs (CCNet shape), scored under each
        # document's PREDICTED language; the collected surprisal table
        # is model-sized (langs × charset²), never corpus-sized
        lm_table = collect_lm_surprisal(
            bigram_lm_models_by_lang(spark.read.parquet(lm_ref_path))
        )
    scored = with_keep_flags(
        extracted,
        min_quality=min_quality,
        min_tokens=min_tokens,
        langs=langs,
        gopher=gopher,
        entropy_min=entropy_min,
        lm_table=lm_table,
        lm_max_bits=lm_max_bits,
        max_compression=max_compression,
        quality_clf=quality_clf,
        script_screen=script_screen,
        python_parallelism=python_parallelism,
    )
    if count_bpe:
        # subword metering (pure JVM column fold, same narrow pass);
        # the kept-corpus token total rides the write Observation below
        from ocrd_segment_spark.operators.bpe import (
            VOCAB,
            load_vocab,
            with_bpe_counts,
        )

        vocab = (
            load_vocab(spark, bpe_vocab_path)
            if bpe_vocab_path is not None
            else VOCAB
        )
        scored = with_bpe_counts(scored, text_col="extracted_text",
                                 vocab=vocab)
    else:
        scored = scored.withColumn("n_bpe_tokens", F.lit(None).cast("long"))

    # funnel counters ride the write action as an Observation — the
    # extraction (the expensive stage) runs exactly ONCE; coalesce
    # guards the zero-row input (sum over no rows is NULL)
    obs = Observation("funnel")
    scored = scored.observe(
        obs,
        F.count(F.lit(1)).alias("pages"),
        F.coalesce(
            F.sum((~F.col("keep_quality")).cast("long")), F.lit(0)
        ).alias("dropped_quality"),
        F.coalesce(
            F.sum((F.col("keep_quality") & ~F.col("keep_lang")).cast("long")),
            F.lit(0),
        ).alias("dropped_lang"),
        F.coalesce(
            F.sum(
                (
                    F.col("keep_quality")
                    & F.col("keep_lang")
                    & ~F.col("keep_gopher")
                ).cast("long")
            ),
            F.lit(0),
        ).alias("dropped_gopher"),
        # precedence chain: each stage counts only docs that survived
        # every earlier stage, so the funnel always reconciles to pages
        F.coalesce(
            F.sum(
                (
                    F.col("keep_quality") & F.col("keep_lang")
                    & F.col("keep_gopher") & ~F.col("keep_entropy")
                ).cast("long")
            ),
            F.lit(0),
        ).alias("dropped_entropy"),
        F.coalesce(
            F.sum(
                (
                    F.col("keep_quality") & F.col("keep_lang")
                    & F.col("keep_gopher") & F.col("keep_entropy")
                    & ~F.col("keep_script")
                ).cast("long")
            ),
            F.lit(0),
        ).alias("dropped_script"),
        F.coalesce(
            F.sum(
                (
                    F.col("keep_quality") & F.col("keep_lang")
                    & F.col("keep_gopher") & F.col("keep_entropy")
                    & F.col("keep_script") & ~F.col("keep_lm")
                ).cast("long")
            ),
            F.lit(0),
        ).alias("dropped_lm"),
        F.coalesce(
            F.sum(
                (
                    F.col("keep_quality") & F.col("keep_lang")
                    & F.col("keep_gopher") & F.col("keep_entropy")
                    & F.col("keep_script") & F.col("keep_lm")
                    & ~F.col("keep_compression")
                ).cast("long")
            ),
            F.lit(0),
        ).alias("dropped_compression"),
        F.coalesce(
            F.sum(
                (
                    F.col("keep_quality") & F.col("keep_lang")
                    & F.col("keep_gopher") & F.col("keep_entropy")
                    & F.col("keep_script") & F.col("keep_lm")
                    & F.col("keep_compression") & ~F.col("keep_clf")
                ).cast("long")
            ),
            F.lit(0),
        ).alias("dropped_clf"),
        F.coalesce(
            F.sum(
                (
                    F.col("keep_quality")
                    & F.col("keep_lang")
                    & F.col("keep_gopher")
                    & F.col("keep_entropy")
                    & F.col("keep_script")
                    & F.col("keep_lm")
                    & F.col("keep_compression")
                    & F.col("keep_clf")
                ).cast("long")
            ),
            F.lit(0),
        ).alias("kept_after_filters"),
        F.coalesce(
            F.sum(F.when(keep_all(), F.col("n_bpe_tokens"))),
            F.lit(0),
        ).alias("kept_bpe_tokens"),
    )
    # the conjunction and the drop list come from the SHARED module —
    # a stage added to with_keep_flags/KEEP_COLS is then enforced here
    # automatically (review pass 4: the hand-rolled copies were the
    # same drift channel the shared chain was created to close)
    kept = scored.filter(keep_all())

    # exact dedup, canonical row kept: rank within content hash by url
    # (deterministic) — one shuffle, fine-grained key, no global sort
    w = W.partitionBy(F.md5("extracted_text")).orderBy("url")
    deduped = (
        kept.withColumn("_rn", F.row_number().over(w))
        .withColumn("is_canonical", F.col("_rn") == 1)
    )
    out = deduped.filter("is_canonical").drop(
        "_rn", "is_canonical", *KEEP_COLS,
        *([] if count_bpe else ["n_bpe_tokens"]),
    )
    # the corpus row count rides the SAME write action as a second
    # Observation — no re-scan of the written output (at 100 TB a
    # readback .count() is a full extra pass over the corpus)
    out_obs = Observation("out_count")
    out = out.observe(out_obs, F.count(F.lit(1)).alias("n_out"))
    out.write.mode("overwrite").parquet(output_path)

    counts = obs.get
    n_out = out_obs.get["n_out"]
    funnel = {
        # pages = pages ENTERING extraction (post-blocklist, post-
        # host-rank, post-snapshot-collapse); the pre-extraction drop
        # stages each count what they removed, in their stage order
        "dropped_domain": (
            dom_obs.get["dropped_domain"] if dom_obs is not None else -1
        ),
        "dropped_content_type": (
            ct_obs.get["dropped"] if ct_obs is not None else -1
        ),
        "dropped_host_rank": (
            hr_obs.get["dropped"] if hr_obs is not None else -1
        ),
        "dropped_stale_snapshot": (
            snap_obs.get["dropped_stale"] if snap_obs is not None else -1
        ),
        "dropped_noindex": (
            hm_obs.get["dropped_noindex"] if hm_obs is not None else -1
        ),
        # aliases = indexable pages that lost their canonical group
        # (the window winners are exactly what enters extraction, so
        # the existing pages Observation closes the count — no extra
        # node on the lineage)
        "dropped_canonical_alias": (
            hm_obs.get["indexable"] - counts["pages"]
            if hm_obs is not None
            else -1
        ),
        "dropped_noai": (
            na_obs.get["dropped"] if na_obs is not None else -1
        ),
        "dropped_soft404": (
            sf_obs.get["dropped"] if sf_obs is not None else -1
        ),
        "outlink_edges": n_outlink_edges,
        "feed_links_found": n_feed_links,
        "tables_extracted": n_tables,
        "image_pairs_found": n_image_pairs,
        "pages": counts["pages"],
        "dropped_quality": counts["dropped_quality"],
        "dropped_lang": counts["dropped_lang"],
        "dropped_gopher": counts["dropped_gopher"],
        # -1 = stage not run (fixed-schema discipline, see below); a
        # real 0 means the stage ran and dropped nothing
        "dropped_entropy": (
            counts["dropped_entropy"] if entropy_min is not None else -1
        ),
        "dropped_lm": (
            counts["dropped_lm"]
            if lm_ref_path is not None and lm_max_bits is not None
            else -1
        ),
        "dropped_compression": (
            counts["dropped_compression"] if max_compression is not None else -1
        ),
        "dropped_clf": counts["dropped_clf"] if quality_clf else -1,
        "dropped_script": (
            counts["dropped_script"] if script_screen else -1
        ),
        "kept_after_filters": counts["kept_after_filters"],
        # subword total of everything passing the filters (pre-dedup;
        # dedup canonicals keep their counts in the output table)
        "kept_bpe_tokens": counts["kept_bpe_tokens"] if count_bpe else -1,
        "dropped_exact_dup": counts["kept_after_filters"] - n_out,
        "corpus_docs": n_out,
    }
    # stats schema is FIXED regardless of flags (append-mode parquet
    # readback resolves the schema from one file footer — conditional
    # keys would be nondeterministically dropped); -1 = stage not run
    funnel["near_dup_candidates"] = -1
    funnel["boilerplate_units_removed"] = -1
    funnel["boilerplate_regions_removed"] = -1
    funnel["pii_docs_redacted"] = -1
    funnel["contaminated_docs"] = -1
    funnel["shards_written"] = -1
    funnel["sequences_packed"] = -1
    for _k in ("diff_added", "diff_removed", "diff_changed", "diff_unchanged"):
        funnel[_k] = -1
    if diff_prev_path is not None:
        # snapshot-over-snapshot delta vs a PREVIOUS corpus (post-write
        # pattern: both sides read committed parquet; the full-outer
        # join carries (url, md5) only — operators/snapshots). The
        # summary collect is 4 rows.
        from ocrd_segment_spark.operators.snapshots import (
            corpus_diff,
            diff_summary,
        )

        d = corpus_diff(
            spark.read.parquet(diff_prev_path),
            spark.read.parquet(output_path),
            key_col="url",
            text_col="extracted_text",
        )
        for r in diff_summary(d).collect():
            funnel[f"diff_{r['status']}"] = r["n_urls"]
    if shard_tokens is not None:
        # token-balanced training-shard layout over the WRITTEN corpus
        # (post-write pattern: one committed-parquet scan, the
        # distributed prefix-sum, no branch of the live lineage).
        # partitionBy(shard_id) gives size-uniform files regardless of
        # document length skew; shard ids are contiguous from 0, so
        # max+1 (riding the write as an Observation) counts them.
        from ocrd_segment_spark.operators.sampling import shard_by_tokens

        corpus = spark.read.parquet(output_path)
        tok_col = "n_bpe_tokens" if count_bpe else "n_tokens"
        sharded = shard_by_tokens(
            corpus, shard_tokens, token_col=tok_col, key_col="url"
        )
        s_obs = Observation("shards")
        sharded = sharded.observe(
            s_obs,
            (F.coalesce(F.max("shard_id"), F.lit(-1)) + 1).alias("n_shards"),
        )
        sharded.write.mode("overwrite").partitionBy("shard_id").parquet(
            output_path + "_sharded"
        )
        funnel["shards_written"] = s_obs.get["n_shards"]
    if pack_seq_tokens is not None:
        # packed-training-sequence manifest over the WRITTEN corpus
        # (post-write pattern: one committed scan, the shared prefix-
        # sum + row-local overlap explode, no branch of the live DAG).
        # seq ids are contiguous from 0, so max+1 rides the write.
        from ocrd_segment_spark.operators.sampling import pack_sequences

        corpus = spark.read.parquet(output_path)
        tok_col = "n_bpe_tokens" if count_bpe else "n_tokens"
        packed = pack_sequences(
            corpus, pack_seq_tokens, token_col=tok_col, key_col="url"
        )
        p_obs = Observation("packed")
        packed = packed.observe(
            p_obs,
            (F.coalesce(F.max("seq_id"), F.lit(-1)) + 1).alias("n_seqs"),
        )
        packed.write.mode("overwrite").parquet(output_path + "_packed")
        funnel["sequences_packed"] = p_obs.get["n_seqs"]
    if decontaminate_path is not None:
        # benchmark decontamination over the WRITTEN corpus (post-write
        # pattern again): the eval set's shingle hashes are broadcast,
        # flagged urls land in <output>_contaminated so downstream
        # training excludes them — an audit table, like the near-dup
        # pairs, because dropping eval-overlapping docs is a reviewed
        # decision, not an automatic one.
        from ocrd_segment_spark.operators.decontaminate import contamination_flags

        corpus = spark.read.parquet(output_path)
        bench = spark.read.parquet(decontaminate_path)
        flags = contamination_flags(
            corpus,
            bench,
            id_col="url",
            text_col="extracted_text",
            benchmark_text_col="text",
        ).filter("contaminated")
        c_obs = Observation("contaminated")
        flags = flags.observe(c_obs, F.count(F.lit(1)).alias("n"))
        flags.write.mode("overwrite").parquet(output_path + "_contaminated")
        funnel["contaminated_docs"] = c_obs.get["n"]
    if boilerplate_min_df is not None:
        # C4-style cross-document boilerplate removal, run over the
        # WRITTEN corpus (like the near-dup audit: reading committed
        # parquet is one cheap column scan; deriving it from live
        # lineage would branch the DAG and re-run the mapInPandas
        # extraction). Two variants, same doc-frequency rule:
        # --preserve-spans removes frequent REGIONS and writes
        # (url, clean_text, REMAPPED region_spans, n_kept, n_removed)
        # — spans slice clean_text exactly, so region structure
        # survives cleaning without re-extraction (round-4 verdict
        # task: users no longer re-extract for clean text + spans);
        # the default line-based strip stays for span-less corpora and
        # emits (url, clean_text, n_kept, n_removed) with the main
        # table's offsets still referring to extracted_text.
        corpus = spark.read.parquet(output_path)
        b_obs = Observation("boiler")
        if preserve_spans:
            from ocrd_segment_spark.operators.paragraphs import (
                remove_frequent_regions,
            )

            cleaned = remove_frequent_regions(
                corpus,
                id_col="url",
                text_col="extracted_text",
                spans_col="region_spans",
                min_doc_freq=boilerplate_min_df,
            ).observe(
                b_obs, F.coalesce(F.sum("n_removed"), F.lit(0)).alias("n")
            )
        else:
            from ocrd_segment_spark.operators.paragraphs import (
                remove_frequent_units,
            )

            cleaned = remove_frequent_units(
                corpus,
                id_col="url",
                text_col="extracted_text",
                min_doc_freq=boilerplate_min_df,
            ).observe(
                b_obs, F.coalesce(F.sum("n_removed"), F.lit(0)).alias("n")
            )
        cleaned.write.mode("overwrite").parquet(output_path + "_clean")
        key = ("boilerplate_regions_removed" if preserve_spans
               else "boilerplate_units_removed")
        funnel[key] = b_obs.get["n"]
    if redact_pii:
        # span-preserving PII scrub over the WRITTEN output (post-write
        # pattern: one cheap scan of committed parquet, zero shuffle —
        # the operator is pure per-document column math). Scrubs the
        # FURTHEST-DOWNSTREAM span-aligned table: the boilerplate-
        # cleaned _clean table when --preserve-spans ran (so users get
        # cleaned AND redacted in one table), else the main corpus.
        # Sibling table keeps the scrub reviewable next to its source;
        # the redacted-doc count rides the write.
        from ocrd_segment_spark.functions.pii import redact_pii_spans

        if boilerplate_min_df is not None and preserve_spans:
            src_tbl = spark.read.parquet(output_path + "_clean")
            scrubbed = redact_pii_spans(src_tbl, text_col="clean_text")
        else:
            src_tbl = spark.read.parquet(output_path)
            scrubbed = redact_pii_spans(src_tbl)
        p_obs = Observation("pii")
        redacted = scrubbed.observe(
            p_obs,
            F.coalesce(
                F.sum((F.col("n_pii_regions") > 0).cast("long")), F.lit(0)
            ).alias("n"),
        )
        redacted.write.mode("overwrite").parquet(output_path + "_redacted")
        funnel["pii_docs_redacted"] = p_obs.get["n"]
    if near_dup_audit is not None:
        # LSH-then-verify over the WRITTEN corpus: MinHash-LSH proposes
        # candidate pairs (bucketed, hot-bucket capped), exact 3-gram
        # Jaccard is scored for just those pairs — so the audit table
        # carries the similarity a human thresholds on, and no corpus
        # self-join exists in the plan. Audit-only, not an automatic
        # drop stage (reads the committed parquet, not live lineage);
        # the pair count rides the write as an Observation (no re-scan).
        from ocrd_segment_spark.operators.dedup import (
            _shingle_table,
            jaccard_verify_pairs,
            minhash_lsh_candidates,
        )

        corpus = spark.read.parquet(output_path)
        # shingle sets derive ONCE (localCheckpoint) — the blocker's
        # band-table self-join and the verifier's two join sides
        # otherwise each re-derive the tokenize→fold→shingle chain
        # from the committed parquet (4 full scans, plan-verified)
        sh = _shingle_table(
            corpus, "url", "extracted_text", 3
        ).localCheckpoint(eager=True)
        cands = minhash_lsh_candidates(
            corpus, id_col="url", text_col="extracted_text", shingles=sh
        )
        verified = jaccard_verify_pairs(
            corpus, cands, id_col="url", text_col="extracted_text",
            shingles=sh,
        )
        nd_obs = Observation("near_dup")
        verified = verified.observe(nd_obs, F.count(F.lit(1)).alias("n_pairs"))
        verified.write.mode("overwrite").parquet(near_dup_audit)
        funnel["near_dup_candidates"] = nd_obs.get["n_pairs"]
    if card:
        # per-language dataset card over the WRITTEN corpus (post-write
        # pattern: one cheap aggregate scan of the committed parquet,
        # never a branch of the live extraction lineage)
        from ocrd_segment_spark.operators.textstats import corpus_card

        corpus_card(
            spark.read.parquet(output_path),
            lang_col="pred_lang",
            text_col="extracted_text",
        ).write.mode("overwrite").parquet(output_path + "_card")
    if host_priors:
        # host-grain content priors over the WRITTEN corpus (same
        # post-write discipline); host grain is tiny, the output
        # broadcasts into the next crawl's frontier/blocklist
        from ocrd_segment_spark.operators.hoststats import (
            host_quality_priors,
        )

        host_quality_priors(
            spark.read.parquet(output_path)
        ).write.mode("overwrite").parquet(output_path + "_host_priors")
    if stats_path is not None:
        spark.createDataFrame([funnel]).write.mode("append").parquet(stats_path)
    return funnel


if __name__ == "__main__":
    main()

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.pipeline.{MultimodalOps, PipelineOps, TextOps}

/** Training-data pipeline operators over documents/embeddings (the
  * BASELINE.json north-star additions): text analysis, language-ID,
  * exact + MinHash + SimHash + n-gram-Jaccard dedup, brute-force and
  * LSH-bucketed cosine similarity, multimodal binary plumbing. All hashing
  * is md5-derived so the DuckDB oracles reproduce results exactly.
  */
object PipelineQueries {
  import TextOps._

  private val toksSql = "string_split_regex(lower(text), '\\s+')"
  private def h32(x: String) = s"('0x' || substr(md5($x), 1, 8))::UBIGINT::BIGINT"
  private val shSql = // word 3-shingles over t
    "[array_to_string(t[i:i+2], ' ') for i in range(1, greatest(len(t)-1, 2))]"
  private lazy val shHashSql = // hashed word 3-shingles over t
    s"[${h32("array_to_string(t[i:i+2], ' ')")} for i in range(1, greatest(len(t)-1, 2))]"

  // shared CTE chain: documents → shingles → minhash signatures → LSH
  // bands → candidate pairs (the pl04 construction, reused by pl12)
  private[queries] lazy val minhashPairCtes =
    s"""d AS (SELECT doc_id, $toksSql AS t FROM documents),
      |sh AS (SELECT doc_id, $shSql AS sh FROM d),
      |hashed AS (SELECT doc_id, [${h32("s")} for s in sh] AS hs FROM sh),
      |sig AS (SELECT doc_id,
      |  [${(0 until 12).map(j =>
           s"list_min([(${TextOps.mhA(j)}*x + ${TextOps.mhB(j)}) % ${TextOps.MinhashP} for x in hs])")
           .mkString(",\n      |   ")}] AS mh
      |FROM hashed),
      |banded AS (
      |  SELECT doc_id, mh, r.range AS band,
      |    md5(array_to_string(mh[r.range*3+1 : r.range*3+3], ',')) AS bkey
      |  FROM sig CROSS JOIN range(0, 4) r),
      |pairs AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    list_sum([CASE WHEN a.mh[i] = b.mh[i] THEN 1 ELSE 0 END
      |              for i in range(1, 13)])::DOUBLE / 12 AS est_jaccard
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // token counting + quality scoring
    "pl01_text_stats" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("toks", tokens(col("text")))
        .withColumn("stop_ratio", TextOps.stopwordRatio(col("toks")))
        .select(col("doc_id"),
          size(col("toks")).as("n_tokens"),
          length(col("text")).as("n_chars_m"),
          size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).as("n_words_re"),
          round(col("stop_ratio"), 6).as("stop_ratio"),
          round(aggregate(transform(col("toks"), w => length(w)), lit(0),
            (a, x) => a + x).cast("double") / size(col("toks")), 6).as("avg_word_len"),
          round(lit(1.0) / (lit(1.0) + exp(-(log(lit(1.0) + size(col("toks"))) * 0.3
            + col("stop_ratio") * 2 - 1))), 6).as("quality"))
    }),

    // marker-based language id with deterministic argmax
    "pl02_langid" -> ((s, dir) => {
      val scored = t(s, dir, "documents")
        .withColumn("toks", tokens(col("text")))
      val withScores = langMarkers.foldLeft(scored) { case (df, (lang, markers)) =>
        df.withColumn(s"s_$lang", markerCount(col("toks"), markers))
      }
      val m = greatest(langMarkers.map { case (l, _) => col(s"s_$l") }: _*)
      val pred = langMarkers.foldLeft(lit(null).cast("string")) { case (acc, (l, _)) =>
        when(acc.isNotNull, acc).otherwise(when(col(s"s_$l") === m, lit(l)))
      }
      withScores.select(col("doc_id") +:
        langMarkers.map { case (l, _) => col(s"s_$l") } :+
        pred.as("predicted_lang"): _*)
    }),

    // exact dedup on normalized 5-token prefix
    "pl03_exact_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      PipelineOps.exactDedup(docs,
          md5(concat_ws(" ", slice(tokens(col("text")), 1, 5)).cast("binary")),
          col("doc_id"))
        .withColumnRenamed("__key", "key_hash")
    }),

    // minhash-LSH candidate pairs
    "pl04_minhash_pairs" -> ((s, dir) => {
      PipelineOps.minhashPairs(t(s, dir, "documents"), col("doc_id"), col("text"),
        numHashes = 12, bands = 4)
    }),

    // simhash near-dup pairs inside source blocks
    "pl05_simhash_pairs" -> ((s, dir) => {
      PipelineOps.simhashPairs(t(s, dir, "documents"), col("doc_id"), col("text"),
        col("source"), maxHamming = 14)
    }),

    // n-gram jaccard pairs inside source blocks
    "pl06_ngram_jaccard" -> ((s, dir) => {
      PipelineOps.ngramJaccardPairs(t(s, dir, "documents"), col("doc_id"), col("text"),
          col("source"), k = 3, minJaccard = 0.03)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
    }),

    // winnowing-lite document fingerprints
    "pl07_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.fingerprint4Hashed(shingleHashes(tokens(col("text")), 3)).as("fp"))
    }),

    // brute-force cosine top-3 (exact ANN baseline)
    "pl08_cosine_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      PipelineOps.cosineTopK(
          e.filter(col("vec_id") < 20), e,
          col("vec_id"), col("embedding"), col("vec_id"), col("embedding"), k = 3)
        .select(col("query_id"), col("cand_id"), col("rank").as("rnk"),
          round(col("sim"), 6).as("sim"))
    }),

    // LSH-bucketed ANN (the scale path)
    "pl09_lsh_ann" -> ((s, dir) => {
      PipelineOps.lshAnn(t(s, dir, "embeddings"), col("vec_id"), col("embedding"),
          nbits = 8, k = 2)
        .select(col("query_id"), col("bucket"), col("cand_id"),
          col("rank").as("rnk"), round(col("sim"), 6).as("sim"))
    }),

    // IVF ANN (k-means quantizer + inverted-list probe). Clustering runs
    // on integer-quantized vectors (IvfAnn.quantized) so every float
    // aggregate in the Lloyd iterations is exact → bit-reproducible across
    // partitionings and engines; the DuckDB oracle unrolls the same three
    // rounds. Similarity is still cosine on the original embeddings.
    "pl11_ivf_ann" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val qv = graft.pipeline.IvfAnn.quantized(col("embedding"))
      val centroids = graft.pipeline.IvfAnn.kmeans(
        e, col("vec_id"), qv, k = 16, iters = 3)
      graft.pipeline.IvfAnn.search(e, e.filter(col("vec_id") < 20),
        col("vec_id"), col("embedding"), col("vec_id"), col("embedding"),
        centroids, nProbe = 4, topK = 3, listVec = Some((qv, qv)))
        .select(col("query_id"), col("cand_id"), col("rank").as("rnk"),
          round(col("sim"), 6).as("sim"))
    }),

    // SemDeDup-style semantic dedup: the k-means lists from pl11's
    // quantizer bound the pairwise cosine to Σ|cluster|²; an item drops
    // when any lower-id cluster member exceeds the cosine threshold
    // (greedy first-seen survivor). Integer-valued quantized vectors
    // keep the threshold comparison engine-exact.
    "pl29_semantic_dedup" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val qv = graft.pipeline.IvfAnn.quantized(col("embedding"))
      val centroids = graft.pipeline.IvfAnn.kmeans(
        e, col("vec_id"), qv, k = 16, iters = 3)
      PipelineOps.semanticDedup(e, col("vec_id"), qv, centroids, tau = 0.3)
        .select(col("item_id").as("vec_id"),
          col("cluster").cast("long").as("cluster"), col("kept"))
    }),

    // dedup groups: connected components over the minhash pair graph —
    // distributed min-label propagation, one shuffle per round
    "pl12_dedup_groups" -> ((s, dir) => {
      val pairs = PipelineOps.minhashPairs(t(s, dir, "documents"),
        col("doc_id"), col("text"), numHashes = 12, bands = 4)
      PipelineOps.dedupGroups(pairs, col("doc_a"), col("doc_b"))
    }),

    // canonical-survivor dedup: pairs -> connected components -> one
    // highest-quality (longest, tie smallest-id) survivor per group;
    // singletons survive trivially — the full production dedup tail
    "pl23_dedup_survivors" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = PipelineOps.minhashPairs(docs, col("doc_id"), col("text"),
        numHashes = 12, bands = 4)
      PipelineOps.dedupSurvivors(docs, col("doc_id"),
        length(col("text")).cast("long"), pairs, col("doc_a"), col("doc_b"))
    }),

    // duplicated-span statistics: 8-token window hashes counted across
    // the corpus — the exact-substring-dedup signal (windows appearing
    // more than once anywhere, self-repetition included)
    "pl26_dup_spans" -> ((s, dir) => {
      PipelineOps.dupSpanStats(t(s, dir, "documents"),
        col("doc_id"), col("text"), k = 8)
    }),

    // exact-substring dedup REMOVAL (Lee et al. 2022): duplicated
    // 8-token windows cut from every non-canonical occurrence, cleaned
    // text re-joined
    // HTML/boilerplate stripping (sd_strip_markup) — the web-corpus
    // cleaning step ahead of quality scoring: a deterministic page is
    // synthesized around each doc's text (head/style/script/comment +
    // named, decimal and hex entities), the native one-pass kernel
    // strips it, and the oracle restates the expected text in plain SQL.
    // The [<>&] pre-strip is identity on the driver corpus (verified)
    // but keeps the oracle exact should a future vintage carry markup.
    "pl31_strip_markup" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("__safe", regexp_replace(col("text"), "[<>&]", ""))
        .withColumn("html", concat(
          lit("<html><head><title>T</title><style>p{color:red}</style>" +
            "</head><body><!-- nav boilerplate --><h1>Doc "),
          col("doc_id").cast("string"),
          lit("</h1><p>"), col("__safe"),
          lit("</p><p>x &lt;tag&gt; &amp; &quot;q&quot; &#65; &#x42;</p>" +
            "<script>var x=1;</script></body></html>")))
        .select(col("doc_id"),
          expr("sd_strip_markup(html)").as("clean"))
        .withColumn("nchars", length(col("clean")).cast("long"))
    }),

    "pl30_remove_dup_spans" -> ((s, dir) => {
      PipelineOps.removeDupSpans(t(s, dir, "documents"),
        col("doc_id"), col("text"), k = 8)
    }),

    // corpus-level LINE dedup (the C4 keep-first / boilerplate-removal
    // rule): a deterministic page is synthesized around each doc's text
    // — two global boilerplate lines (count = corpus size), a 7-way
    // category line, a per-doc unique line, the doc text, and a blank
    // line that must survive untouched — and the op keeps exactly the
    // canonical minimum-(doc_id, pos) instance of every duplicated line
    "pl33_remove_dup_lines" -> ((s, dir) => {
      val pages = t(s, dir, "documents")
        .withColumn("page", concat(
          lit("Share on Facebook\nDoc "), col("doc_id").cast("string"),
          lit("\nCategory: "), (col("doc_id") % 7).cast("string"),
          lit("\n"), coalesce(col("text"), lit("")),
          lit("\n\nCopyright 2020 Example Corp")))
      PipelineOps.removeDupLines(pages, col("doc_id"), col("page"))
    }),

    // temperature-smoothed domain mixture (the alpha=0.5 data-recipe
    // reweighting): a skewed domain map is synthesized — one giant
    // 'web' domain plus a low-resource tail keyed on source — and the
    // op keeps exactly the ppm-hash-gated docs at each domain's
    // smoothed rate (small domains saturate at rate 1, the big one is
    // trimmed toward the token budget)
    "pl34_domain_mixture" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .withColumn("dom", when(col("doc_id") % 17 === 0, col("source"))
          .otherwise(lit("web")))
        .withColumn("n_tok", size(TextOps.tokens(col("text"))))
      PipelineOps.domainMixture(d, col("doc_id"), col("dom"),
        col("n_tok"), budgetTokens = 13000L)
    }),

    // n-gram repetition quality signals (the Gopher/RefinedWeb-family
    // "repetition removal" filters): most-common 2-/3-gram character
    // mass and duplicated-5-gram character mass per document, as exact
    // integers — a map-only projection at any corpus scale; the caller
    // divides by total_chars for the published fractional thresholds
    "pl32_repetition_stats" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), expr("sd_repetition_stats(text)").as("st"))
        .select(col("doc_id"),
          col("st.n_words").as("n_words"),
          col("st.total_chars").as("total_chars"),
          col("st.top2_count").as("top2_count"),
          col("st.top2_chars").as("top2_chars"),
          col("st.top3_count").as("top3_count"),
          col("st.top3_chars").as("top3_chars"),
          col("st.dup5_chars").as("dup5_chars"))
    }),

    // BM25 lexical top-k: the non-embedding leg of similarity search —
    // keyword retrieval with exact nano-scaled score accumulation
    "pl27_bm25" -> ((s, dir) => {
      PipelineOps.bm25TopK(t(s, dir, "documents"), col("doc_id"), col("text"),
        query = Seq("spark", "window", "customer", "stream"), topK = 25)
    }),

    // unigram-LM (perplexity-style) quality scoring: corpus-trained
    // add-one-smoothed token log-probs summed per doc as nano-longs
    "pl28_unigram_lm" -> ((s, dir) => {
      PipelineOps.unigramLogProb(t(s, dir, "documents"),
        col("doc_id"), col("text"))
    }),

    // deterministic stratified sampling: cap docs per (source, lang)
    // stratum by md5-hash order — the training-mix balancing op
    "pl13_stratified_sample" -> ((s, dir) => {
      PipelineOps.stratifiedSample(t(s, dir, "documents"),
          concat_ws("|", col("source"), col("lang")), col("doc_id"), perKey = 40)
        .select(col("doc_id"), col("source"), col("lang"), col("sample_rank"))
    }),

    // embedding post-processing: l2 normalize + deterministic int8
    // quantization + reconstruction error
    "pl14_embed_quantize" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .withColumn("v", PipelineOps.asDouble(col("embedding")))
        .withColumn("nrm", sqrt(PipelineOps.dot(col("v"), col("v"))))
        .withColumn("scale", lit(127.0) /
          array_max(transform(col("v"), x => abs(x / col("nrm")))))
        .withColumn("qs", transform(col("v"),
          x => floor(x / col("nrm") * col("scale") + lit(0.5)).cast("int")))
        .select(col("vec_id"),
          round(col("nrm"), 6).as("nrm6"),
          array_min(col("qs")).as("qmin"),
          array_max(col("qs")).as("qmax"),
          aggregate(col("qs"), lit(0L), (a, x) => a + x).as("qsum"),
          round(aggregate(zip_with(col("qs"), col("v"),
              (q, x) => abs(q / col("scale") - x / col("nrm"))),
            lit(0.0), (a, x) => a + x), 6).as("err6"))
    }),

    // eval-set decontamination: 5-gram overlap against a benchmark subset
    "pl15_contamination" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      PipelineOps.contamination(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0),
        col("doc_id"), col("text"), col("text"), k = 5)
    }),

    // vocabulary build: top-100 tokens by tf with document frequency
    "pl16_vocab_topk" -> ((s, dir) => {
      PipelineOps.vocabTopK(t(s, dir, "documents"), col("doc_id"), col("text"), 100)
    }),

    // intra-doc repetition ratios (quality rule)
    "pl17_repetition" -> ((s, dir) => {
      PipelineOps.repetitionStats(t(s, dir, "documents"), col("doc_id"), col("text"), 3)
    }),

    // PII redaction (CCNet/Dolma scrub stage): deterministic synthetic
    // emails/IPs/phones appended per doc so the redaction provably fires;
    // output pins the redacted text hash + per-category counts
    "pl18_pii_redact" -> ((s, dir) => {
      val spiked = t(s, dir, "documents")
        .withColumn("spiked", concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@ex"),
          pmod(col("doc_id"), lit(7)), lit(".com from "),
          pmod(col("doc_id"), lit(256)), lit(".13.7."),
          pmod(col("doc_id"), lit(250)), lit(" call +49-30-555-"),
          pmod(col("doc_id"), lit(9000)) + 1000))
      def occurrences(c: org.apache.spark.sql.Column, token: String) =
        ((length(c) - length(replace(c, lit(token), lit("")))) / token.length)
          .cast("int")
      spiked.select(col("doc_id"),
        substring(md5(TextOps.redactPii(col("spiked"))), 1, 16).as("red_hash"),
        occurrences(TextOps.redactPii(col("spiked")), "[EMAIL]").as("n_email"),
        occurrences(TextOps.redactPii(col("spiked")), "[IP]").as("n_ip"),
        occurrences(TextOps.redactPii(col("spiked")), "[PHONE]").as("n_phone"))
    }),

    // audio modality: per-doc 16-bit PCM mono WAV synthesized with real
    // RIFF structure, decoded back by MultimodalOps.decodeWav (direct
    // chunk-walk parser) — rate/channels/frames/mean-amplitude come from
    // actual samples, the oracle recomputes them from the generator
    // formula v_i = ((doc_id*7 + i*13) % 2001) - 1000
    "pl21_audio_wav" -> ((s, dir) => {
      val synth = udf((docId: Long, n: Int) =>
        MultimodalOps.synthWav(Array.tabulate(n)(i =>
          (((docId * 7 + i * 13) % 2001) - 1000).toShort), 16000))
      val src = t(s, dir, "documents")
        .withColumn("n", (pmod(col("doc_id"), lit(50)) + 10).cast("int"))
        .withColumn("clip", synth(col("doc_id"), col("n")))
      MultimodalOps.decodeBatch(src, "clip", "wav")
        .select(col("doc_id"),
          col("media_meta.n_bytes").as("n_bytes"),
          col("media_meta.sample_rate").as("sample_rate"),
          col("media_meta.channels").as("channels"),
          col("features.n_frames").as("n_frames"),
          round(col("features.mean_byte"), 6).as("mean_amp"))
    }),

    // audio feature extraction (the VAD/segmentation pre-pass): per-
    // frame exact-integer energy (abs-amplitude sum), peak, and sign
    // crossings over the pl21 synthesized PCM clips — one row per
    // (doc, 16-sample frame), map-only; the oracle replays the
    // generator formula per frame slice
    "pl35_audio_framestats" -> ((s, dir) => {
      val synth = udf((docId: Long, n: Int) =>
        MultimodalOps.synthWav(Array.tabulate(n)(i =>
          (((docId * 7 + i * 13) % 2001) - 1000).toShort), 16000))
      val src = t(s, dir, "documents")
        .withColumn("n", (pmod(col("doc_id"), lit(50)) + 10).cast("int"))
        .withColumn("clip", synth(col("doc_id"), col("n")))
      MultimodalOps.audioFrameStats(src, "doc_id", "clip", frameLen = 16)
    }),

    // image feature extraction (the vision-curation brightness/contrast
    // pre-pass): per 8x8-tile exact-integer luma sum/min/max over real
    // PNG decodes of per-doc gradient images — one row per (doc, tile),
    // partial edge tiles included (37x23 -> 5x3 tiles), map-only; the
    // oracle replays the gradient formula per tile slice
    "pl36_image_tilestats" -> ((s, dir) => {
      val synth = udf((docId: Long) =>
        MultimodalOps.synthGradientPng(37, 23, docId * 13))
      val src = t(s, dir, "documents").withColumn("img", synth(col("doc_id")))
      MultimodalOps.imageTileStats(src, "doc_id", "img", tile = 8)
    }),

    // BPE-ish token accounting: GPT-2 pre-tokenizer piece counts (the
    // boundary pass before merges — the scale-stable token-budget
    // estimator), per-class counts and mean piece length; the RE2-
    // compatible pattern runs verbatim in the DuckDB oracle
    "pl20_bpe_pieces" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("pcs", TextOps.bpePieces(col("text")))
        .select(col("doc_id"),
          size(col("pcs")).as("n_pieces"),
          size(filter(col("pcs"), p => p.rlike("^\\s+$"))).as("n_ws"),
          size(filter(col("pcs"), p => p.rlike("^ ?\\p{N}+$"))).as("n_num"),
          round(aggregate(transform(col("pcs"), p => length(p)), lit(0),
            (a, x) => a + x).cast("double") / size(col("pcs")), 6).as("avg_len"))
    }),

    // training-sequence packing: concat-then-chunk layout over the corpus
    // in doc_id order — each doc's global token offset, owning 2048-token
    // sequence, in-sequence offset, and sequences spanned. The running
    // total is ScalableRank.globalPrefixSum (range repartition + partition
    // sum pass), not a single-reducer ORDER BY window.
    "pl19_seq_packing" -> ((s, dir) => {
      PipelineOps.packSequences(t(s, dir, "documents"),
        col("doc_id"), size(TextOps.tokens(col("text"))), 2048L)
    }),

    // token-budget corpus selection: the curation step that turns "all
    // crawl text" into "the N-token training set" — rank by a quality
    // score, admit greedily while the cumulative tokens BEFORE each doc
    // stay under budget. Distributed prefix sum, not a single-reducer
    // window; the oracle restates it as the ordered window sum.
    "pl22_budget_select" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"),
          (col("doc_id") * 2654435761L % 1000).as("quality"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      PipelineOps.selectByBudget(d,
        Seq(col("quality").desc, col("doc_id")), "n_tokens", 10000L)
        .select("doc_id", "quality", "n_tokens", "cum_before")
    }),

    // multimodal binary column plumbing with deterministic fake decode
    // real image pipeline: per-doc solid-gray PNG synthesized through the
    // JVM codec, decoded back by MultimodalOps.decodeBatch via
    // javax.imageio — width/height/mean come from actual pixels, the
    // oracle recomputes them from the generator formulas
    "pl10_multimodal" -> ((s, dir) => {
      val synth = udf((w: Int, h: Int, v: Int) => MultimodalOps.synthPng(w, h, v))
      val src = t(s, dir, "documents")
        .withColumn("w", (pmod(col("doc_id"), lit(13)) + 4).cast("int"))
        .withColumn("h", (pmod(col("doc_id"), lit(7)) + 3).cast("int"))
        .withColumn("v", pmod(col("doc_id"), lit(256)).cast("int"))
        .withColumn("img", synth(col("w"), col("h"), col("v")))
      MultimodalOps.decodeBatch(src, "img", "png")
        .select(col("doc_id"),
          col("media_meta.width").as("img_w"),
          col("media_meta.height").as("img_h"),
          col("features.mean_byte").as("mean_v"),
          col("features.n_frames").as("nframes"),
          // text-side blob stats ride along (stub-free byte math)
          length(col("text").cast("binary")).as("n_bytes"),
          md5(col("text").cast("binary")).as("checksum"))
    }),

    // image RESIZE: gradient PNG through the real codec, exact integer
    // box-downsample (floor of block mean per channel), deterministic
    // pixel checksum — the oracle recomputes it from the generator
    // formula with no decoder
    "pl24_image_resize" -> ((s, dir) => {
      val synth = udf((id: Long) => MultimodalOps.synthGradientPng(16, 12, id))
      val src = t(s, dir, "documents").select(col("doc_id"))
        .withColumn("img", synth(col("doc_id")))
      MultimodalOps.resizeBatch(src, "img", 2)
        .select(col("doc_id"), col("resized_w"), col("resized_h"),
          col("resized_sum"))
    }),

    // video FRAME-SAMPLE: Y4M (the uncompressed interchange container —
    // real parse, no codec) sampled every 3rd frame with exact Y-plane
    // luma sums per sampled frame
    "pl25_video_frames" -> ((s, dir) => {
      val synth = udf((id: Long) => MultimodalOps.synthY4m(8, 6, 10, id))
      val src = t(s, dir, "documents").select(col("doc_id"))
        .withColumn("vid", synth(col("doc_id")))
      MultimodalOps.sampleFrames(src, "vid", 3)
        .select(col("doc_id"), col("frame_idx"), col("luma_sum"), col("n_pix"))
    })
  )

  /** Shared DuckDB twin of IvfAnn.kmeans(k=16, iters=3, hash seeding)
    * over 2^20-quantized embeddings: integer-valued arithmetic keeps
    * every step bit-reproducible across engines. Ends at the final
    * centroid table `c3`; consumers append their own assignment. */
  private val kmeansCte: String =
    """WITH ve AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> x::DOUBLE) AS v,
        |    [floor(x::DOUBLE * 1048576.0 + 0.5) for x in embedding] AS q
        |  FROM embeddings),
        |seedr AS (
        |  SELECT vec_id, q,
        |    row_number() OVER (ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::UBIGINT::BIGINT, vec_id) - 1 AS cid
        |  FROM ve),
        |c0 AS (SELECT cid, q AS cv FROM seedr WHERE cid < 16),
        |a1 AS (SELECT ve.vec_id, ve.q, c.cid,
        |    list_sum([ (ve.q[i]-c.cv[i])*(ve.q[i]-c.cv[i]) for i in range(1, len(ve.q)+1) ]) AS d2
        |  FROM ve CROSS JOIN c0 c),
        |g1 AS (SELECT vec_id, q, cid FROM (
        |    SELECT vec_id, q, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM a1)
        |  WHERE rn = 1),
        |m1 AS (SELECT cid, dim, SUM(val)/COUNT(*) AS m FROM (
        |    SELECT cid, UNNEST(q) AS val, UNNEST(range(1, len(q)+1)) AS dim FROM g1)
        |  GROUP BY cid, dim),
        |mm1 AS (SELECT cid, LIST(m ORDER BY dim) AS cv FROM m1 GROUP BY cid),
        |c1 AS (SELECT s.cid, COALESCE(mm1.cv, s.cv) AS cv FROM c0 s LEFT JOIN mm1 ON s.cid = mm1.cid),
        |a2 AS (SELECT ve.vec_id, ve.q, c.cid,
        |    list_sum([ (ve.q[i]-c.cv[i])*(ve.q[i]-c.cv[i]) for i in range(1, len(ve.q)+1) ]) AS d2
        |  FROM ve CROSS JOIN c1 c),
        |g2 AS (SELECT vec_id, q, cid FROM (
        |    SELECT vec_id, q, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM a2)
        |  WHERE rn = 1),
        |m2 AS (SELECT cid, dim, SUM(val)/COUNT(*) AS m FROM (
        |    SELECT cid, UNNEST(q) AS val, UNNEST(range(1, len(q)+1)) AS dim FROM g2)
        |  GROUP BY cid, dim),
        |mm2 AS (SELECT cid, LIST(m ORDER BY dim) AS cv FROM m2 GROUP BY cid),
        |c2 AS (SELECT s.cid, COALESCE(mm2.cv, s.cv) AS cv FROM c1 s LEFT JOIN mm2 ON s.cid = mm2.cid),
        |a3 AS (SELECT ve.vec_id, ve.q, c.cid,
        |    list_sum([ (ve.q[i]-c.cv[i])*(ve.q[i]-c.cv[i]) for i in range(1, len(ve.q)+1) ]) AS d2
        |  FROM ve CROSS JOIN c2 c),
        |g3 AS (SELECT vec_id, q, cid FROM (
        |    SELECT vec_id, q, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM a3)
        |  WHERE rn = 1),
        |m3 AS (SELECT cid, dim, SUM(val)/COUNT(*) AS m FROM (
        |    SELECT cid, UNNEST(q) AS val, UNNEST(range(1, len(q)+1)) AS dim FROM g3)
        |  GROUP BY cid, dim),
        |mm3 AS (SELECT cid, LIST(m ORDER BY dim) AS cv FROM m3 GROUP BY cid),
        |c3 AS (SELECT s.cid, COALESCE(mm3.cv, s.cv) AS cv FROM c2 s LEFT JOIN mm3 ON s.cid = mm3.cid),"""
      .stripMargin

  val oracles: Map[String, String] = Map(
    // 16x12 gradient pixel v = (r*7 + c*3 + id) % 251, 2x box block sums
    // floored per channel; checksum Σ (R*31+C)·(r+g+b) over the 8x6 grid
    "pl24_image_resize" ->
      """WITH px AS (SELECT d.doc_id, t.range // 8 AS R, t.range % 8 AS C
        |  FROM documents AS d CROSS JOIN range(0, 48) AS t)
        |SELECT doc_id, CAST(8 AS INT) AS resized_w, CAST(6 AS INT) AS resized_h,
        |  CAST(SUM((R*31 + C) * 3 * ((
        |      ((2*R*7 + 2*C*3 + doc_id) % 251)
        |    + ((2*R*7 + (2*C+1)*3 + doc_id) % 251)
        |    + (((2*R+1)*7 + 2*C*3 + doc_id) % 251)
        |    + (((2*R+1)*7 + (2*C+1)*3 + doc_id) % 251)) // 4)) AS BIGINT)
        |    AS resized_sum
        |FROM px GROUP BY doc_id""".stripMargin,

    // 8x6 C420 Y4M, Y pixel (r*5 + c*11 + f*13 + id) % 240, frames
    // 0/3/6/9 sampled
    "pl25_video_frames" ->
      """WITH f AS (SELECT d.doc_id, CAST(3*fr.range AS INT) AS frame_idx
        |  FROM documents AS d CROSS JOIN range(0, 4) AS fr),
        |s AS (SELECT doc_id, frame_idx,
        |    CAST(SUM(((p.range // 8)*5 + (p.range % 8)*11
        |      + frame_idx*13 + doc_id) % 240) AS BIGINT) AS luma_sum
        |  FROM f CROSS JOIN range(0, 48) AS p
        |  GROUP BY doc_id, frame_idx)
        |SELECT doc_id, frame_idx, luma_sum, CAST(48 AS INT) AS n_pix
        |FROM s""".stripMargin,

    "pl21_audio_wav" ->
      """WITH d AS (SELECT doc_id, doc_id % 50 + 10 AS n FROM documents),
        |s AS (SELECT doc_id, n,
        |    [abs(((doc_id*7 + i*13) % 2001) - 1000) for i in range(0, CAST(n AS INT))]
        |      AS a
        |  FROM d)
        |SELECT doc_id,
        |  CAST(44 + 2*n AS INT) AS n_bytes,
        |  CAST(16000 AS INT) AS sample_rate,
        |  CAST(1 AS INT) AS channels,
        |  CAST(n AS INT) AS n_frames,
        |  round(CAST(list_sum(a) AS DOUBLE)/n/32768*255, 6) AS mean_amp
        |FROM s""".stripMargin,

    // tile stats restated: the gradient pixel is v = (r*7 + c*3 +
    // doc_id*13) % 251 on every channel, so channel-sum luma = 3v; each
    // tile's pixel list is the nested comprehension over its clipped
    // row/column ranges
    "pl36_image_tilestats" ->
      """WITH g AS (SELECT doc_id, unnest(range(5)) AS tx FROM documents),
        |g2 AS (SELECT doc_id, tx, unnest(range(3)) AS ty FROM g),
        |px AS (SELECT doc_id, tx, ty,
        |    flatten([[3*((r*7 + c*3 + doc_id*13) % 251)
        |      for c in range(tx*8, least((tx+1)*8, 37))]
        |      for r in range(ty*8, least((ty+1)*8, 23))]) AS lum
        |  FROM g2)
        |SELECT doc_id, CAST(tx AS INT) AS tile_x, CAST(ty AS INT) AS tile_y,
        |  CAST(len(lum) AS INT) AS n_px,
        |  CAST(list_sum(lum) AS BIGINT) AS lum_sum,
        |  CAST(list_min(lum) AS BIGINT) AS lum_min,
        |  CAST(list_max(lum) AS BIGINT) AS lum_max
        |FROM px""".stripMargin,

    // frame stats restated: per doc, frame f slices the generator
    // formula at [f*16, min((f+1)*16, n)); crossings compare adjacent
    // in-frame sample signs (1-based list indexing)
    "pl35_audio_framestats" ->
      """WITH d AS (SELECT doc_id, CAST(doc_id % 50 + 10 AS INT) AS n
        |  FROM documents),
        |f AS (SELECT doc_id, n,
        |    unnest(range(CAST((n + 15) // 16 AS INT))) AS frame_idx
        |  FROM d),
        |s AS (SELECT doc_id, frame_idx,
        |    [((doc_id*7 + i*13) % 2001) - 1000
        |     for i in range(frame_idx*16, least((frame_idx+1)*16, n))] AS v
        |  FROM f)
        |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |  CAST(len(v) AS INT) AS n_samples,
        |  CAST(list_sum([abs(x) for x in v]) AS BIGINT) AS abs_sum,
        |  CAST(list_max([abs(x) for x in v]) AS BIGINT) AS peak,
        |  CAST(len([i for i in range(1, len(v))
        |    if (v[i] < 0) != (v[i+1] < 0)]) AS BIGINT) AS crossings
        |FROM s""".stripMargin,

    "pl20_bpe_pieces" ->
      """WITH d AS (SELECT doc_id, regexp_extract_all(text,
        |    '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+')
        |    AS pcs
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(pcs) AS INT) AS n_pieces,
        |  CAST(len(list_filter(pcs, x -> regexp_full_match(x, '\s+'))) AS INT) AS n_ws,
        |  CAST(len(list_filter(pcs, x -> regexp_full_match(x, ' ?\p{N}+'))) AS INT)
        |    AS n_num,
        |  round(CAST(list_sum([length(x) for x in pcs]) AS DOUBLE)/len(pcs), 6)
        |    AS avg_len
        |FROM d""".stripMargin,

    // exclusive running total restated as a window cumsum (fine at oracle
    // scale; the engine side uses the partition-sum scheme instead)
    "pl22_budget_select" ->
      s"""WITH d AS (SELECT doc_id,
        |    (doc_id * 2654435761) % 1000 AS quality,
        |    CAST(len($toksSql) AS BIGINT) AS n_tokens
        |  FROM documents),
        |p AS (SELECT doc_id, quality, n_tokens,
        |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS cum_before
        |  FROM d)
        |SELECT doc_id, CAST(quality AS BIGINT) AS quality, n_tokens, cum_before
        |FROM p WHERE cum_before < 10000""".stripMargin,

    "pl19_seq_packing" ->
      s"""WITH d AS (SELECT doc_id,
        |    CAST(len($toksSql) AS BIGINT) AS n_tokens
        |  FROM documents),
        |p AS (SELECT doc_id, n_tokens,
        |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS start_off
        |  FROM d)
        |SELECT doc_id, n_tokens, start_off,
        |  start_off // 2048 AS seq_id,
        |  start_off % 2048 AS off_in_seq,
        |  ((start_off + greatest(n_tokens, 1) - 1) // 2048)
        |    - (start_off // 2048) + 1 AS n_seqs
        |FROM p""".stripMargin,
    "pl01_text_stats" ->
      s"""WITH d AS (SELECT doc_id, text, $toksSql AS t FROM documents),
        |s AS (SELECT doc_id, text, t,
        |  len(list_filter(t, x -> x IN ('the','a','of','and')))::DOUBLE / len(t) AS stop_ratio
        |FROM d)
        |SELECT doc_id, CAST(len(t) AS INT) AS n_tokens,
        |  CAST(length(text) AS INT) AS n_chars_m,
        |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS INT) AS n_words_re,
        |  round(stop_ratio, 6) AS stop_ratio,
        |  round(CAST(list_sum([length(x) for x in t]) AS DOUBLE) / len(t), 6) AS avg_word_len,
        |  round(1.0/(1.0 + exp(-(ln(1.0 + len(t)) * 0.3 + stop_ratio * 2 - 1))), 6) AS quality
        |FROM s""".stripMargin,

    "pl02_langid" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS t FROM documents),
        |sc AS (SELECT doc_id,
        |  CAST(len(list_filter(t, x -> x IN ('the','a','of','and','fast'))) AS INT) AS s_en,
        |  CAST(len(list_filter(t, x -> x IN ('der','die','und','schnell','batch'))) AS INT) AS s_de,
        |  CAST(len(list_filter(t, x -> x IN ('el','la','de','rapido','join'))) AS INT) AS s_es,
        |  CAST(len(list_filter(t, x -> x IN ('le','la','et','vite','scan'))) AS INT) AS s_fr,
        |  CAST(len(list_filter(t, x -> x IN ('de','shi','zai','stream','merge'))) AS INT) AS s_zh
        |FROM d)
        |SELECT doc_id, s_en, s_de, s_es, s_fr, s_zh,
        |  CASE WHEN s_en = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'en'
        |       WHEN s_de = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'de'
        |       WHEN s_es = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'es'
        |       WHEN s_fr = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'fr'
        |       ELSE 'zh' END AS predicted_lang
        |FROM sc""".stripMargin,

    "pl03_exact_dedup" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS t FROM documents)
        |SELECT md5(array_to_string(t[1:5], ' ')) AS key_hash,
        |  MIN(doc_id) AS keep_id, COUNT(*) AS n_docs
        |FROM d GROUP BY 1""".stripMargin,

    "pl04_minhash_pairs" ->
      s"""WITH $minhashPairCtes
        |SELECT doc_a, doc_b, est_jaccard FROM pairs""".stripMargin,

    // transitive closure of the minhash pair graph — small components, so
    // the recursive CTE terminates fast; min id per component = group id
    "pl12_dedup_groups" ->
      s"""WITH RECURSIVE $minhashPairCtes,
        |edges AS (
        |  SELECT doc_a AS a, doc_b AS b FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs),
        |nodes AS (SELECT DISTINCT a AS id FROM edges),
        |reach(id, r) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT reach.id, e.b FROM reach JOIN edges e ON e.a = reach.r)
        |SELECT id, MIN(r) AS group_id, MIN(r) = id AS keep
        |FROM reach GROUP BY id""".stripMargin,

    // pl12's transitive closure extended with the survivor window
    "pl23_dedup_survivors" ->
      s"""WITH RECURSIVE $minhashPairCtes,
        |edges AS (
        |  SELECT doc_a AS a, doc_b AS b FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs),
        |nodes AS (SELECT DISTINCT a AS id FROM edges),
        |reach(id, r) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT reach.id, e.b FROM reach JOIN edges e ON e.a = reach.r),
        |grp AS (SELECT id, MIN(r) AS group_id FROM reach GROUP BY id),
        |tagged AS (SELECT d.doc_id,
        |    COALESCE(g.group_id, d.doc_id) AS group_id,
        |    length(d.text) AS q
        |  FROM documents d LEFT JOIN grp g ON g.id = d.doc_id),
        |rk AS (SELECT doc_id, group_id,
        |    row_number() OVER (PARTITION BY group_id
        |      ORDER BY q DESC, doc_id) AS rn
        |  FROM tagged)
        |SELECT doc_id, group_id, rn = 1 AS survivor FROM rk""".stripMargin,

    // 8-token window hash = h32 of the space-joined window, the
    // sd_shingle_hash32 contract pl15 already pins
    "pl26_dup_spans" -> {
      val wins = s"[${h32("array_to_string(t[i:i+7], ' ')")} for i in range(1, len(t)-6)]"
      s"""WITH d AS (SELECT doc_id, $toksSql AS t FROM documents),
        |w AS (SELECT doc_id, unnest($wins) AS wh FROM d),
        |c AS (SELECT wh, count(*) AS wc FROM w GROUP BY 1),
        |per AS (SELECT w.doc_id, count(*) AS n_windows,
        |    CAST(SUM(CASE WHEN c.wc > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_dup_windows
        |  FROM w JOIN c USING (wh) GROUP BY 1)
        |SELECT d.doc_id, COALESCE(per.n_windows, 0) AS n_windows,
        |  COALESCE(per.n_dup_windows, 0) AS n_dup_windows
        |FROM d LEFT JOIN per USING (doc_id)""".stripMargin
    },

    // exact-substring removal restated: window instances ranked by
    // (doc_id, pos) within each hash — rank 1 is the surviving canonical
    // copy; coverage and text rebuild via list comprehensions
    // the synthesized page strips to a closed form: title text + h1 +
    // body text + the entity line; tags become spaces and squeeze
    "pl31_strip_markup" ->
      """SELECT doc_id,
        |  'T Doc ' || CAST(doc_id AS VARCHAR) || ' ' ||
        |    regexp_replace(text, '[<>&]', '', 'g') ||
        |    ' x <tag> & "q" A B' AS clean,
        |  CAST(length('T Doc ' || CAST(doc_id AS VARCHAR) || ' ' ||
        |    regexp_replace(text, '[<>&]', '', 'g') ||
        |    ' x <tag> & "q" A B') AS BIGINT) AS nchars
        |FROM documents""".stripMargin,

    // repetition stats restated: per-doc word list, n-gram comprehension
    // slices (DuckDB slices are 1-based inclusive: t[i:i+1] is a 2-gram),
    // top gram by (count DESC, gram ASC) row_number, dup-5 mass as a
    // filtered sum; all integers so the hash compare is exact
    "pl32_repetition_stats" ->
      """WITH d AS (SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS t FROM documents),
        |w AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_words,
        |    CAST(length(array_to_string(t, ' ')) AS BIGINT) AS total_chars
        |  FROM d),
        |g2 AS (SELECT doc_id, unnest([array_to_string(t[i:i+1], ' ')
        |    for i in range(1, len(t))]) AS g FROM d),
        |t2 AS (SELECT doc_id, CAST(c AS BIGINT) AS top2_count,
        |    CAST(c * length(g) AS BIGINT) AS top2_chars
        |  FROM (SELECT doc_id, g, c, row_number() OVER (
        |      PARTITION BY doc_id ORDER BY c DESC, g) AS rn
        |    FROM (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2))
        |  WHERE rn = 1),
        |g3 AS (SELECT doc_id, unnest([array_to_string(t[i:i+2], ' ')
        |    for i in range(1, len(t) - 1)]) AS g FROM d),
        |t3 AS (SELECT doc_id, CAST(c AS BIGINT) AS top3_count,
        |    CAST(c * length(g) AS BIGINT) AS top3_chars
        |  FROM (SELECT doc_id, g, c, row_number() OVER (
        |      PARTITION BY doc_id ORDER BY c DESC, g) AS rn
        |    FROM (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2))
        |  WHERE rn = 1),
        |g5 AS (SELECT doc_id, unnest([array_to_string(t[i:i+4], ' ')
        |    for i in range(1, len(t) - 3)]) AS g FROM d),
        |c5 AS (SELECT doc_id, CAST(COALESCE(SUM(CASE WHEN c >= 2
        |      THEN c * length(g) END), 0) AS BIGINT) AS dup5_chars
        |  FROM (SELECT doc_id, g, count(*) AS c FROM g5 GROUP BY 1, 2)
        |  GROUP BY 1)
        |SELECT w.doc_id, w.n_words, w.total_chars,
        |  CAST(COALESCE(t2.top2_count, 0) AS BIGINT) AS top2_count,
        |  CAST(COALESCE(t2.top2_chars, 0) AS BIGINT) AS top2_chars,
        |  CAST(COALESCE(t3.top3_count, 0) AS BIGINT) AS top3_count,
        |  CAST(COALESCE(t3.top3_chars, 0) AS BIGINT) AS top3_chars,
        |  CAST(COALESCE(c5.dup5_chars, 0) AS BIGINT) AS dup5_chars
        |FROM w LEFT JOIN t2 USING (doc_id) LEFT JOIN t3 USING (doc_id)
        |  LEFT JOIN c5 USING (doc_id)""".stripMargin,

    "pl30_remove_dup_spans" -> {
      val wins = s"[{'pos': i-1, 'wh': ${h32("array_to_string(t[i:i+7], ' ')")}} " +
        "for i in range(1, len(t)-6)]"
      s"""WITH d AS (SELECT doc_id,
        |    COALESCE($toksSql, CAST([] AS VARCHAR[])) AS t FROM documents),
        |w AS (SELECT doc_id, unnest($wins) AS u FROM d),
        |w2 AS (SELECT doc_id, u['pos'] AS pos, u['wh'] AS wh FROM w),
        |m AS (SELECT doc_id, pos,
        |    count(*) OVER (PARTITION BY wh) AS wc,
        |    row_number() OVER (PARTITION BY wh ORDER BY doc_id, pos) AS rn
        |  FROM w2),
        |ds AS (SELECT doc_id, list_sort(list(pos)) AS dupstarts
        |  FROM m WHERE wc > 1 AND rn > 1 GROUP BY 1),
        |j AS (SELECT d.doc_id, d.t, COALESCE(ds.dupstarts, []) AS dss
        |  FROM d LEFT JOIN ds USING (doc_id)),
        |kk AS (SELECT doc_id, len(t) AS nt,
        |    [t[p] for p in range(1, len(t)+1)
        |     if len(list_filter(dss, s -> s <= p-1 AND p-1 <= s+7)) = 0] AS kept
        |  FROM j)
        |SELECT doc_id,
        |  COALESCE(array_to_string(kept, ' '), '') AS clean_text,
        |  CAST(nt AS BIGINT) AS n_tokens,
        |  CAST(nt - len(kept) AS BIGINT) AS n_removed
        |FROM kk""".stripMargin
    },

    // domain mixture restated step-for-step: sqrt masses quantized to
    // nano-longs (order-free integer denominator), one fixed double
    // operation sequence for the rate, md5-h32 ppm gate
    "pl34_domain_mixture" ->
      s"""WITH d AS (SELECT doc_id,
        |    CASE WHEN doc_id % 17 = 0 THEN source ELSE 'web' END AS dom,
        |    len($toksSql) AS n_tok FROM documents),
        |pd AS (SELECT dom, CAST(SUM(n_tok) AS BIGINT) AS t_d,
        |    CAST(round(sqrt(CAST(CAST(SUM(n_tok) AS BIGINT) AS DOUBLE))
        |      * 1000000000.0) AS BIGINT) AS s_nano
        |  FROM d GROUP BY 1),
        |tot AS (SELECT CAST(SUM(s_nano) AS BIGINT) AS s FROM pd),
        |rates AS (SELECT dom,
        |    CAST(floor(least(1.0, 13000.0
        |      * (CAST(s_nano AS DOUBLE) / CAST(tot.s AS DOUBLE))
        |      / CAST(t_d AS DOUBLE)) * 1000000.0) AS BIGINT) AS rate_ppm
        |  FROM pd, tot)
        |SELECT d.doc_id, d.dom AS domain,
        |  CAST(d.n_tok AS BIGINT) AS n_tokens, r.rate_ppm
        |FROM d JOIN rates r USING (dom)
        |WHERE ${h32("CAST(d.doc_id AS VARCHAR)")} % 1000000
        |  < r.rate_ppm""".stripMargin,

    // line dedup restated: keep a non-blank line instance iff its line
    // is corpus-unique or it is the row_number()=1 occurrence under
    // (doc_id, pos) — exactly the op's min-(doc_id, pos) keeper; blank
    // lines always survive
    "pl33_remove_dup_lines" ->
      """WITH pages AS (SELECT doc_id,
        |    'Share on Facebook' || chr(10) || 'Doc ' || doc_id || chr(10) ||
        |    'Category: ' || (doc_id % 7) || chr(10) || COALESCE(text, '') ||
        |    chr(10) || chr(10) || 'Copyright 2020 Example Corp' AS page
        |  FROM documents),
        |l AS (SELECT doc_id,
        |    unnest(string_split(page, chr(10))) AS line,
        |    unnest(range(len(string_split(page, chr(10))))) AS pos
        |  FROM pages),
        |m AS (SELECT doc_id, pos, line,
        |    CASE WHEN trim(line) = '' THEN TRUE
        |      ELSE count(*) OVER (PARTITION BY line) < 2
        |        OR row_number() OVER (PARTITION BY line
        |             ORDER BY doc_id, pos) = 1
        |    END AS keep
        |  FROM l)
        |SELECT doc_id,
        |  COALESCE(string_agg(line, chr(10) ORDER BY pos)
        |    FILTER (WHERE keep), '') AS clean_text,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_removed
        |FROM m GROUP BY doc_id""".stripMargin,

    // BM25 restated with the SAME operand order (IEEE +,-,*,/ are
    // bit-identical given identical order; the constants compose the
    // same way — (1.2 + 1.0), not a pre-evaluated 2.2); per-term scores
    // quantize to nano-longs so the final sum is order-free
    "pl27_bm25" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS t FROM documents),
        |st AS (SELECT count(*) AS n, CAST(SUM(len(t)) AS BIGINT) AS sdl FROM d),
        |tf AS (SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tfreq
        |  FROM (SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM d)
        |  WHERE term IN ('spark', 'window', 'customer', 'stream')
        |  GROUP BY 1, 2, 3),
        |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS dfreq FROM tf GROUP BY 1),
        |sc AS (SELECT tf.doc_id,
        |    CAST(SUM(CAST(round(
        |      (ln((CAST(st.n AS DOUBLE) - df.dfreq + 0.5)
        |          / (df.dfreq + 0.5) + 1.0)
        |        * (tf.tfreq * (1.2 + 1.0))
        |        / (tf.tfreq + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(tf.dl AS DOUBLE)
        |            / (CAST(st.sdl AS DOUBLE) / CAST(st.n AS DOUBLE))))))
        |      * 1000000000.0) AS BIGINT)) AS BIGINT) AS bm25_nano
        |  FROM tf, df, st WHERE tf.term = df.term GROUP BY 1)
        |SELECT doc_id, bm25_nano FROM sc
        |ORDER BY bm25_nano DESC, doc_id LIMIT 25""".stripMargin,

    // identical operand order: (tc + 1.0) / CAST(T + V AS DOUBLE), then
    // nano-long quantization makes the per-doc sum order-free
    "pl28_unigram_lm" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS t FROM documents),
        |tok AS (SELECT doc_id, term
        |  FROM (SELECT doc_id, unnest(t) AS term FROM d)),
        |c AS (SELECT term, count(*) AS tc FROM tok GROUP BY 1),
        |st AS (SELECT count(*) AS v, CAST(SUM(tc) AS BIGINT) AS tt FROM c),
        |lp AS (SELECT tok.doc_id,
        |    CAST(round(ln((CAST(c.tc AS DOUBLE) + 1.0)
        |        / CAST(st.tt + st.v AS DOUBLE))
        |      * 1000000000.0) AS BIGINT) AS lpn
        |  FROM tok, c, st WHERE tok.term = c.term)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(SUM(lpn) AS BIGINT) AS lp_nano_sum
        |FROM lp GROUP BY doc_id""".stripMargin,

    "pl13_stratified_sample" ->
      """WITH d AS (SELECT doc_id, source, lang,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT::BIGINT AS h
        |  FROM documents),
        |r AS (SELECT doc_id, source, lang,
        |    row_number() OVER (PARTITION BY source || '|' || lang
        |      ORDER BY h, doc_id) AS rk
        |  FROM d)
        |SELECT doc_id, source, lang, CAST(rk AS INT) AS sample_rank
        |FROM r WHERE rk <= 40""".stripMargin,

    "pl14_embed_quantize" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
        |n AS (SELECT vec_id, v,
        |    sqrt(list_sum([v[i]*v[i] for i in range(1, len(v)+1)])) AS nrm FROM e),
        |m AS (SELECT vec_id, v, nrm,
        |    127.0 / list_max([abs(x/nrm) for x in v]) AS scale FROM n),
        |q AS (SELECT vec_id, v, nrm, scale,
        |    [CAST(floor(x/nrm*scale + 0.5) AS INT) for x in v] AS qs FROM m)
        |SELECT vec_id, round(nrm, 6) AS nrm6,
        |  list_min(qs) AS qmin, list_max(qs) AS qmax,
        |  CAST(list_sum(qs) AS BIGINT) AS qsum,
        |  round(list_sum([abs(qs[i]/scale - v[i]/nrm)
        |    for i in range(1, len(v)+1)]), 6) AS err6
        |FROM q""".stripMargin,

    "pl15_contamination" -> {
      val sh5 = s"[${h32("array_to_string(t[i:i+4], ' ')")} for i in range(1, greatest(len(t)-3, 2))]"
      s"""WITH d AS (SELECT doc_id, $toksSql AS t FROM documents),
        |g AS (SELECT doc_id, list_distinct($sh5) AS gs FROM d),
        |doc AS (SELECT doc_id, gs FROM g WHERE doc_id % 50 <> 0),
        |bench AS (SELECT DISTINCT unnest(gs) AS bg FROM g WHERE doc_id % 50 = 0),
        |hits AS (
        |  SELECT doc_id, count(*) AS n_hits FROM (
        |    SELECT doc_id, unnest(gs) AS g1 FROM doc) x
        |  WHERE g1 IN (SELECT bg FROM bench) GROUP BY doc_id)
        |SELECT doc.doc_id, CAST(len(doc.gs) AS INT) AS n_grams,
        |  COALESCE(hits.n_hits, 0) AS n_hits
        |FROM doc LEFT JOIN hits ON doc.doc_id = hits.doc_id""".stripMargin
    },

    "pl16_vocab_topk" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS t FROM documents),
        |x AS (SELECT doc_id, unnest(t) AS tok FROM d),
        |v AS (SELECT tok, count(*) AS tf, count(DISTINCT doc_id) AS df
        |  FROM x GROUP BY tok)
        |SELECT tok, tf, df FROM v ORDER BY tf DESC, tok LIMIT 100""".stripMargin,

    "pl17_repetition" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS t FROM documents),
        |g AS (SELECT doc_id, t, $shHashSql AS gs FROM d)
        |SELECT doc_id, CAST(len(t) AS INT) AS n_tokens,
        |  round(1.0 - len(list_distinct(t))::DOUBLE / len(t), 6) AS tok_rep,
        |  round(1.0 - len(list_distinct(gs))::DOUBLE / len(gs), 6) AS gram_rep
        |FROM g""".stripMargin,

    "pl18_pii_redact" ->
      s"""WITH sp AS (SELECT doc_id, text || ' contact user' ||
        |  CAST(doc_id AS VARCHAR) || '@ex' || CAST(doc_id % 7 AS VARCHAR) ||
        |  '.com from ' || CAST(doc_id % 256 AS VARCHAR) || '.13.7.' ||
        |  CAST(doc_id % 250 AS VARCHAR) || ' call +49-30-555-' ||
        |  CAST(doc_id % 9000 + 1000 AS VARCHAR) AS spiked FROM documents),
        |red AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
        |  spiked,
        |  '${TextOps.PiiEmailRe}', '[EMAIL]', 'g'),
        |  '${TextOps.PiiIpRe}', '[IP]', 'g'),
        |  '${TextOps.PiiPhoneRe}', '[PHONE]', 'g') AS r
        |FROM sp)
        |SELECT doc_id, substr(md5(r), 1, 16) AS red_hash,
        |  CAST((length(r) - length(replace(r, '[EMAIL]', ''))) / 7 AS INT) AS n_email,
        |  CAST((length(r) - length(replace(r, '[IP]', ''))) / 4 AS INT) AS n_ip,
        |  CAST((length(r) - length(replace(r, '[PHONE]', ''))) / 7 AS INT) AS n_phone
        |FROM red""".stripMargin,

    "pl05_simhash_pairs" ->
      s"""WITH d AS (SELECT doc_id, source, $toksSql AS t FROM documents),
        |hd AS (SELECT doc_id, source, [${h32("t0")} for t0 in t] AS hs FROM d),
        |sg AS (SELECT doc_id, source, ${TextOps.simhashSqlDuck("hs")} AS sh FROM hd)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.sh::BIGINT, b.sh::BIGINT)) AS INT) AS hamming
        |FROM sg a JOIN sg b ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sh::BIGINT, b.sh::BIGINT)) <= 14""".stripMargin,

    "pl06_ngram_jaccard" ->
      s"""WITH d AS (SELECT doc_id, source, $toksSql AS t FROM documents),
        |g AS (SELECT doc_id, source,
        |  list_distinct([${h32("s")} for s in $shSql]) AS sh FROM d),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    len(list_filter(a.sh, x -> list_contains(b.sh, x)))::DOUBLE AS inter,
        |    len(a.sh) + len(b.sh) AS tot
        |  FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b, round(inter / (tot - inter), 6) AS jaccard
        |FROM p WHERE inter / (tot - inter) > 0.03""".stripMargin,

    "pl07_fingerprint" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS t FROM documents),
        |sh AS (SELECT doc_id, $shSql AS sh FROM d)
        |SELECT doc_id,
        |  array_to_string(list_sort([${h32("s")} for s in sh])[1:4], '-') AS fp
        |FROM sh""".stripMargin,

    "pl08_cosine_topk" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
        |           FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 20),
        |pairs AS (
        |  SELECT q.qid, e.vec_id AS cid,
        |    list_sum([qv[i]*v[i] for i in range(1, len(qv)+1)]) /
        |      (sqrt(list_sum([qv[i]*qv[i] for i in range(1, len(qv)+1)])) *
        |       sqrt(list_sum([v[i]*v[i] for i in range(1, len(v)+1)]))) AS sim
        |  FROM q CROSS JOIN e WHERE q.qid <> e.vec_id),
        |ranked AS (SELECT qid, cid, sim,
        |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rk
        |  FROM pairs)
        |SELECT qid AS query_id, cid AS cand_id, CAST(rk AS INT) AS rnk,
        |  round(sim, 6) AS sim
        |FROM ranked WHERE rk <= 3""".stripMargin,

    "pl09_lsh_ann" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
        |           FROM embeddings),
        |bkt AS (SELECT vec_id, v, p.range AS p,
        |  CASE WHEN list_sum([v[d] * ((${h32("p.range || '_' || d")} % 1001) - 500)::DOUBLE
        |                      for d in range(1, len(v)+1)]) >= 0
        |       THEN (1::BIGINT << p.range) ELSE 0::BIGINT END AS bit_p
        |  FROM e CROSS JOIN range(0, 8) p),
        |buck AS (SELECT vec_id, CAST(SUM(bit_p) AS BIGINT) AS bucket, any_value(v) AS v
        |  FROM bkt GROUP BY vec_id),
        |pairs AS (
        |  SELECT a.vec_id AS query_id, a.bucket, b.vec_id AS cand_id,
        |    list_sum([a.v[i]*b.v[i] for i in range(1, len(a.v)+1)]) /
        |      (sqrt(list_sum([a.v[i]*a.v[i] for i in range(1, len(a.v)+1)])) *
        |       sqrt(list_sum([b.v[i]*b.v[i] for i in range(1, len(b.v)+1)]))) AS sim
        |  FROM buck a JOIN buck b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
        |ranked AS (SELECT query_id, bucket, cand_id, sim,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rk
        |  FROM pairs)
        |SELECT query_id, bucket, cand_id, CAST(rk AS INT) AS rnk, round(sim, 6) AS sim
        |FROM ranked WHERE rk <= 2""".stripMargin,

    // final assignment + greedy lower-id cosine dedup inside each list
    "pl29_semantic_dedup" ->
      (kmeansCte + """
        |asg AS (SELECT vec_id, q, cid FROM (
        |    SELECT ve.vec_id, ve.q, c.cid,
        |      row_number() OVER (PARTITION BY ve.vec_id ORDER BY
        |        list_sum([ (ve.q[i]-c.cv[i])*(ve.q[i]-c.cv[i]) for i in range(1, len(ve.q)+1) ]), c.cid) AS rn
        |    FROM ve CROSS JOIN c3 c)
        |  WHERE rn = 1),
        |dup AS (SELECT DISTINCT a.vec_id FROM asg a JOIN asg b
        |  ON a.cid = b.cid AND b.vec_id < a.vec_id
        |  WHERE list_sum([a.q[i]*b.q[i] for i in range(1, len(a.q)+1)]) /
        |    (sqrt(list_sum([a.q[i]*a.q[i] for i in range(1, len(a.q)+1)])) *
        |     sqrt(list_sum([b.q[i]*b.q[i] for i in range(1, len(b.q)+1)]))) > 0.3)
        |SELECT asg.vec_id, CAST(asg.cid AS BIGINT) AS cluster,
        |  dup.vec_id IS NULL AS kept
        |FROM asg LEFT JOIN dup ON asg.vec_id = dup.vec_id""".stripMargin),

    "pl11_ivf_ann" ->
      (kmeansCte + """

        |asg AS (SELECT vec_id AS cand_id, cid AS list_id FROM (
        |    SELECT ve.vec_id, c.cid,
        |      row_number() OVER (PARTITION BY ve.vec_id ORDER BY
        |        list_sum([ (ve.q[i]-c.cv[i])*(ve.q[i]-c.cv[i]) for i in range(1, len(ve.q)+1) ]), c.cid) AS rn
        |    FROM ve CROSS JOIN c3 c)
        |  WHERE rn = 1),
        |prb AS (SELECT vec_id AS query_id, cid AS list_id FROM (
        |    SELECT ve.vec_id, c.cid,
        |      row_number() OVER (PARTITION BY ve.vec_id ORDER BY
        |        list_sum([ (ve.q[i]-c.cv[i])*(ve.q[i]-c.cv[i]) for i in range(1, len(ve.q)+1) ]), c.cid) AS rn
        |    FROM ve CROSS JOIN c3 c WHERE ve.vec_id < 20)
        |  WHERE rn <= 4),
        |cand AS (SELECT p.query_id, a.cand_id
        |  FROM prb p JOIN asg a ON p.list_id = a.list_id AND p.query_id <> a.cand_id),
        |sims AS (SELECT c.query_id, c.cand_id,
        |    list_sum([qe.v[i]*ce.v[i] for i in range(1, len(qe.v)+1)]) /
        |      (sqrt(list_sum([qe.v[i]*qe.v[i] for i in range(1, len(qe.v)+1)])) *
        |       sqrt(list_sum([ce.v[i]*ce.v[i] for i in range(1, len(ce.v)+1)]))) AS sim
        |  FROM cand c JOIN ve qe ON c.query_id = qe.vec_id JOIN ve ce ON c.cand_id = ce.vec_id),
        |ranked AS (SELECT query_id, cand_id, sim,
        |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rk
        |  FROM sims)
        |SELECT query_id, cand_id, CAST(rk AS INT) AS rnk, round(sim, 6) AS sim
        |FROM ranked WHERE rk <= 3""".stripMargin),

    "pl10_multimodal" ->
      s"""SELECT doc_id,
        |  CAST(doc_id % 13 + 4 AS INT) AS img_w,
        |  CAST(doc_id % 7 + 3 AS INT) AS img_h,
        |  CAST(doc_id % 256 AS DOUBLE) AS mean_v,
        |  1 AS nframes,
        |  CAST(length(text) AS INT) AS n_bytes,
        |  md5(text) AS checksum
        |FROM documents""".stripMargin
  )
}

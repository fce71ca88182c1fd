package graft.operators

import org.apache.spark.sql.functions._

import graft.core.Tables.load
import graft.functions.TextFunctions._

/** Text-analysis surface over `documents` (SURVEY §2.10 extensions /
  * north_star): quality scoring, token statistics, fingerprinting,
  * language ID. All per-row Column algebra — linear scans, no shuffle.
  */
object TextQueries {

  def queries: Seq[Q] = Seq(
    Q("text_stats",
      (s, d) => load(s, d, "documents").select(
        col("doc_id"),
        size(tokens(col("text"))).as("n_words"),
        stopwordRatio(col("text")).as("stopword_ratio"),
        punctRatio(col("text")).as("punct_ratio"),
        meanTokenLen(col("text")).as("mean_token_len")),
      Some("""SELECT doc_id,
             |CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words,
             |len(list_filter(string_split(text, ' '),
             |    w -> w IN ('the','a','an','of','and','or','to','in','is','on')))
             |  / len(string_split(text, ' ')) AS stopword_ratio,
             |CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
             |  / length(text) AS punct_ratio,
             |CAST(list_sum(list_transform(string_split(text, ' '), w -> length(w))) AS DOUBLE)
             |  / len(string_split(text, ' ')) AS mean_token_len
             |FROM documents""".stripMargin),
      "token counting + quality signals (length/punct/stopword ratios)"),

    Q("text_quality_score",
      (s, d) => load(s, d, "documents").select(
        col("doc_id"),
        qualityScore(col("text")).as("quality")),
      Some("""SELECT doc_id,
             |(least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
             | + least((len(list_filter(string_split(text, ' '),
             |      w -> w IN ('the','a','an','of','and','or','to','in','is','on')))
             |    / len(string_split(text, ' '))) * 5.0, 1.0)
             | + greatest(0.0, 1.0 - (CAST(length(text) -
             |      length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
             |    / length(text)) * 10.0)) / 3.0 AS quality
             |FROM documents""".stripMargin),
      "composite C4/Gopher-style quality score"),

    Q("text_pretoken_count",
      (s, d) => load(s, d, "documents").select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]+"), lit(0)))
          .as("n_pretokens")),
      Some("""SELECT doc_id,
             |CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]+')) AS INTEGER) AS n_pretokens
             |FROM documents""".stripMargin),
      "BPE-ish pre-tokenizer token count (regex run segmentation)"),

    Q("text_fingerprint",
      (s, d) => load(s, d, "documents").select(
        col("doc_id"),
        bagOfWordsFingerprint(col("text")).as("fingerprint")),
      Some("""SELECT doc_id,
             |md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS fingerprint
             |FROM documents""".stripMargin),
      "bag-of-words canonical document fingerprint (md5 matches across engines)"),

    Q("text_chunks",
      (s, d) => graft.functions.Chunker.chunk(
        load(s, d, "documents").filter(col("doc_id") < 50),
        "doc_id", "text", size = 32, stride = 16),
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text, ' ') AS w
             |  FROM documents WHERE doc_id < 50),
             |st AS (
             |  SELECT doc_id, w,
             |    unnest(generate_series(1, greatest(len(w) - 31, 1), 16)) AS start_token
             |  FROM t)
             |SELECT doc_id,
             |  CAST((start_token - 1) // 16 AS INTEGER) AS chunk_id,
             |  CAST(start_token AS INTEGER) AS start_token,
             |  array_to_string(w[start_token:start_token + 31], ' ') AS chunk_text,
             |  CAST(least(32, len(w) - start_token + 1) AS INTEGER) AS n_tokens
             |FROM st""".stripMargin),
      "document chunker: overlapping 32-token windows, stride 16 (1→N generator)"),

    // Composite flagship: the full cleaning pipeline a training-data
    // job runs — quality gate → exact dedup (keep lowest doc_id) →
    // chunking — expressed as one declarative plan (filters push into
    // the scan; dedup is one hash-agg; chunking is a generator).
    Q("pipeline_clean_chunks",
      (s, d) => {
        val docs = load(s, d, "documents")
        val quality = docs.filter(
          graft.functions.TextFunctions.qualityScore(col("text")) > 0.5)
        val keep = quality
          .groupBy(md5(col("text")).as("h"))
          .agg(min(col("doc_id")).as("doc_id"))
          .select(col("doc_id"))
        val kept = quality.join(keep, Seq("doc_id"), "left_semi")
        graft.functions.Chunker.chunk(kept, "doc_id", "text",
          size = 64, stride = 32)
          .select(col("doc_id"), col("chunk_id"), col("n_tokens"))
      },
      Some("""WITH q AS (
             |  SELECT doc_id, text FROM documents
             |  WHERE (least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
             |   + least((len(list_filter(string_split(text, ' '),
             |        w -> w IN ('the','a','an','of','and','or','to','in','is','on')))
             |      / len(string_split(text, ' '))) * 5.0, 1.0)
             |   + greatest(0.0, 1.0 - (CAST(length(text) -
             |        length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
             |      / length(text)) * 10.0)) / 3.0 > 0.5),
             |keep AS (
             |  SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)),
             |kept AS (
             |  SELECT q.doc_id, string_split(q.text, ' ') AS w
             |  FROM q SEMI JOIN keep ON q.doc_id = keep.doc_id),
             |st AS (
             |  SELECT doc_id, w,
             |    unnest(generate_series(1, greatest(len(w) - 63, 1), 32)) AS start_token
             |  FROM kept)
             |SELECT doc_id,
             |  CAST((start_token - 1) // 32 AS INTEGER) AS chunk_id,
             |  CAST(least(64, len(w) - start_token + 1) AS INTEGER) AS n_tokens
             |FROM st""".stripMargin),
      "composite training-data pipeline: quality gate → exact dedup → chunk"),

    // The marker-count argmax IS SQL-expressible (list_filter + struct
    // sort), so the heuristic is fully oracle-checked: same scores, same
    // (score, lang) tie-break.
    Q("text_langid",
      (s, d) => load(s, d, "documents").select(
        col("doc_id"), col("lang").as("lang_true"),
        langId(col("text")).as("lang_pred")),
      Some("""WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents)
             |SELECT doc_id, lang AS lang_true,
             |  (list_sort([
             |    {'score': len(list_filter(ws, w -> list_contains(['the','and','of','with'], w))), 'lang': 'en'},
             |    {'score': len(list_filter(ws, w -> list_contains(['el','la','los','de','con'], w))), 'lang': 'es'},
             |    {'score': len(list_filter(ws, w -> list_contains(['der','die','das','und','mit'], w))), 'lang': 'de'},
             |    {'score': len(list_filter(ws, w -> list_contains(['le','les','des','et','avec'], w))), 'lang': 'fr'},
             |    {'score': len(list_filter(ws, w -> list_contains(['de5','shi4','zai4'], w))), 'lang': 'zh'}
             |  ])[-1]).lang AS lang_pred
             |FROM t""".stripMargin),
      "n-gram-marker language ID heuristic, argmax oracle-checked"))
}

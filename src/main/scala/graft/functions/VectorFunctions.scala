package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftext.VectorColumns

/** Public entry points for the native vector expressions (implementation in
  * org.apache.spark.sql.graftext — see that file for why it lives in the
  * spark namespace). */
object VectorFunctions {
  def vec_dot(a: Column, b: Column): Column = VectorColumns.vec_dot(a, b)
  def vec_norm(a: Column): Column = VectorColumns.vec_norm(a)

  /** Elementwise a − b over array<float> — the IVF-PQ residual step
    * (double subtraction, float cast; see graftext.FloatVectorSub for
    * the DuckDB-parity contract). */
  def vec_sub(a: Column, b: Column): Column = VectorColumns.vec_sub(a, b)

  /** Fixed-point quantization array<float> → array<long> in one native
    * pass: round(double(x_i)·scale) cast long, Spark round()/cast-exact
    * (see graftext.FloatVectorQuantize for the parity contract). */
  def vec_quantize(a: Column, scale: Double): Column =
    VectorColumns.vec_quantize(a, scale)

  /** Per-row int8 quantization statistics struct<max_abs_f, scale,
    * q_sum, q_min, q_max> in one native pass (see
    * graftext.FloatQuantizeStats for the parity contract). */
  def vec_quantize_stats(a: Column): Column =
    VectorColumns.vec_quantize_stats(a)

  /** All i<j pairs of an array as array<struct<a,b>> (native single-pass
    * expansion; see graftext.PairCombos). */
  def pair_combos(x: Column): Column =
    org.apache.spark.sql.graftext.PairColumns.pair_combos(x)

  /** Nearest-centroid cluster id by max cosine over a packed
    * array<struct<cl:int,centroid:array<float>>> column (native codegen'd
    * K×dim loop; see graftext.NearestCentroid for the bit-parity
    * contract with the array_min(transform(...)) formulation). */
  def nearest_centroid(cents: Column, emb: Column): Column =
    org.apache.spark.sql.graftext.CentroidColumns.nearest_centroid(cents, emb)

  /** ADC nearest-code id over one subspace's packed codewords
    * array<struct<code:int,cent:array<float>,nc2:double>> (native
    * codegen'd; see graftext.NearestCode for the bit-parity contract). */
  def nearest_code(cands: Column, sub: Column, na2: Column): Column =
    org.apache.spark.sql.graftext.CodeColumns.nearest_code(cands, sub, na2)

  /** 31-base rolling polynomial fingerprint mod 1e9+7 (native codegen'd
    * char loop; see graftext.RollingHash31 for the parity contract with
    * the split+aggregate HOF formulation). */
  def rolling_hash31(text: Column): Column =
    org.apache.spark.sql.graftext.HashColumns.rolling_hash31(text)

  /** Word n-gram (shingle) array — native byte-level gram builder (see
    * graftext.WordNGrams for the parity contract with the
    * transform+slice+concat_ws HOF formulation). */
  def word_ngrams(tokens: Column, n: Int = 3, sep: String = " "): Column =
    org.apache.spark.sql.graftext.GramColumns.word_ngrams(tokens, n, sep)

  /** Rolling 31-base fingerprint of every k-token window (the
    * exact-substring-dedup position hashes), one O(total-chars) pass. */
  def kgram_hashes(tokens: Column, k: Int): Column =
    org.apache.spark.sql.graftext.KgramHashes.kgram_hashes(tokens, k)

  /** Ordered literal replace chain in ONE bounded-tree node (see
    * graftext.ChainReplace for the parity contract with the nested
    * `replace(replace(...))` formulation and why nesting is structurally
    * dead at production vocabulary depth). */
  def chain_replace(s: Column, pairs: Seq[(String, String)]): Column =
    org.apache.spark.sql.graftext.ChainReplaceColumns.chain_replace(s, pairs)
}

/** Public entry points for the sketch expressions (bloom build/probe,
  * count-min point estimates — graftext.SketchColumns has the hashing
  * contract notes). */
object SketchFunctions {
  def bloom_agg(value: Column, expectedItems: Long): Column =
    org.apache.spark.sql.graftext.SketchColumns.bloom_agg(value, expectedItems)
  def bloom_might_contain(bloomBytes: Array[Byte], value: Column): Column =
    org.apache.spark.sql.graftext.SketchColumns.bloom_might_contain(bloomBytes, value)
  def cms_estimate(sketchBytes: Array[Byte], hashedValue: Column): Column =
    org.apache.spark.sql.graftext.SketchColumns.cms_estimate(sketchBytes, hashedValue)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-level text helpers shared by the dedup / text-analysis
  * operators. All pure `functions._` compositions — whole-stage
  * codegen'd, no UDFs in the hot path.
  */
object TextFunctions {

  /** Lower-cased whitespace tokens. */
  def words(text: Column): Column = split(lower(text), "\\s+")

  /** Word n-gram shingles (distinct), safe for short docs. */
  def shingles(text: Column, n: Int): Column = {
    val w = words(text)
    when(size(w) >= n,
      array_distinct(transform(
        sequence(lit(1), size(w) - (n - 1)),
        i => array_join(slice(w, i, lit(n)), " "))))
      .otherwise(array(array_join(w, " ")))
  }

  /** MinHash permutation i of a pre-hashed shingle: re-hash the 64-bit
    * base hash with the permutation index as a second input. Avoids
    * multiply-add wrap-around (which ANSI mode rejects) and hashing a
    * single long is one xxhash64 block — cheap and codegen'd. */
  def permutedHash(shingleHash: Column, i: Int): Column =
    xxhash64(shingleHash, lit(i))
}

package graft.domain

import org.apache.spark.sql.types._

/** Explicit schema for a Solana `getBlock` response, covering exactly the
  * fields the reference consumes (cf. reference request shape
  * SERVER/subscriber.py:34-43; consumed keys
  * RECEIVER/stage2_processing.cpp:198-203,86-89 and
  * SERVER/combined_subscriber.py:126-143). Supplying the schema up front
  * lets Spark's JSON reader skip every other subtree — the declarative
  * equivalent of the reference's SIMD structural-index + bracket-skip
  * parse (SURVEY.md §2.2: do-not-port).
  */
object BlockSchema {

  val tokenBalance: StructType = StructType(Seq(
    StructField("accountIndex", IntegerType),
    StructField("mint", StringType),
    StructField("owner", StringType),
    StructField("uiTokenAmount", StructType(Seq(
      StructField("uiAmountString", StringType))))))

  val transaction: StructType = StructType(Seq(
    StructField("transaction", StructType(Seq(
      StructField("message", StructType(Seq(
        StructField("accountKeys", ArrayType(StringType)))))))),
    StructField("meta", StructType(Seq(
      StructField("loadedAddresses", StructType(Seq(
        StructField("readonly", ArrayType(StringType)),
        StructField("writable", ArrayType(StringType))))),
      StructField("preTokenBalances", ArrayType(tokenBalance)),
      StructField("postTokenBalances", ArrayType(tokenBalance)),
      StructField("logMessages", ArrayType(StringType)))))))

  val block: StructType = StructType(Seq(
    StructField("result", StructType(Seq(
      StructField("blockTime", LongType),
      StructField("transactions", ArrayType(transaction)))))))
}

package graft

import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Scratch diagnostic: bloom write/read + dictionary-page membership. */
object ProfBloom {
  def dump(dir: String, label: String): Unit = {
    java.nio.file.Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).foreach { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.toUri), new org.apache.hadoop.conf.Configuration())
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val schema = r.getFooter.getFileMetaData.getSchema
          r.getRowGroups.asScala.foreach { b =>
            val cc = b.getColumns.asScala.find(_.getPath.toDotString == "repo").get
            val bf = r.readBloomFilter(cc)
            val es = cc.getEncodingStats
            val fullDict = es != null && !es.hasNonDictionaryEncodedPages
            var dictInfo = ""
            if (fullDict) {
              val desc = schema.getColumnDescription(cc.getPath.toArray)
              val store: org.apache.parquet.column.page.DictionaryPageReadStore =
                r.getDictionaryReader(b)
              val page = store.readDictionaryPage(desc)
              if (page != null) {
                val dict = page.getEncoding.initDictionary(desc, page)
                val vals = (0 to dict.getMaxId).map(i => dict.decodeToBinary(i).toStringUsingUTF8).toSet
                dictInfo = s" dictSize=${vals.size} k7=${vals("k7")} nope=${vals("nope")}"
              } else dictInfo = " dictPage=null"
            }
            println(s"BLOOMPROBE[$label] ${f.getFileName} fullDict=$fullDict bloom=${bf != null}" + {
              if (bf != null) {
                val hit = bf.findHash(bf.hash(org.apache.parquet.io.api.Binary.fromString("k7")))
                val miss = bf.findHash(bf.hash(org.apache.parquet.io.api.Binary.fromString("nope")))
                s" present=k7:$hit absent=nope:$miss"
              } else ""
            } + dictInfo)
          }
        } finally r.close()
      }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").appName("prof-bloom")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    import spark.implicits._

    // 1) spark writer, dictionary ON (default): expect fullDict membership
    val d1 = java.nio.file.Files.createTempDirectory("bloomprobe1").toString
    (1 to 1000).map(i => (s"k${i % 50}", i)).toDF("repo", "n")
      .repartition(2).write
      .option("parquet.bloom.filter.enabled#repo", "true")
      .option("parquet.bloom.filter.expected.ndv#repo", "64")
      .mode("overwrite").parquet(d1)
    dump(d1, "dict-on")

    // 2) spark writer, dictionary OFF: expect a real bloom
    val d2 = java.nio.file.Files.createTempDirectory("bloomprobe2").toString
    (1 to 1000).map(i => (s"k${i % 50}", i)).toDF("repo", "n")
      .repartition(2).write
      .option("parquet.enable.dictionary", "false")
      .option("parquet.bloom.filter.enabled#repo", "true")
      .option("parquet.bloom.filter.expected.ndv#repo", "64")
      .mode("overwrite").parquet(d2)
    dump(d2, "dict-off")
    spark.stop()
  }
}

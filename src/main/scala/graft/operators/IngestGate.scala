package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.{QueryDef, Tables}
import graft.functions.CleanFunctions
import graft.ingest.IngestPipeline
import graft.ingest.IngestPipeline._

/** End-to-end ingest gate: the reference's main program (land → quarantine
  * → repair → heal-parents → conform, TablesCreated-Imported.sql:378-1117)
  * as ONE oracled query.
  *
  * The dirty staging table is derived deterministically from `customer` on
  * BOTH engines (same `%`-keyed dirt cases as FIXTURES.md §3: invalid PK
  * uuids, padded/uppercase uuids, wrong-format and blank dates, boolean
  * vocabulary, unparseable and blank numerics, padded text, orphan FKs).
  * The Spark side runs the real [[IngestPipeline.run]]; the oracle
  * replicates each stage's semantics in SQL. The gate therefore pins the
  * whole pipeline's row-level behavior, not just individual cleaners
  * (q29-q31).
  *
  * Scale: the pipeline stages are narrow maps plus one broadcast anti-join
  * per FK edge — no shuffle of the staging table at all.
  */
object IngestGate {

  private val U = CleanFunctions.UuidRegex

  val q72 = QueryDef(
    "q72_ingest_e2e",
    s"""WITH staging AS (
       |  SELECT
       |    CASE WHEN c_custkey % 10 = 0 THEN 'BAD-' || CAST(c_custkey AS VARCHAR)
       |         WHEN c_custkey % 10 = 1 THEN '  ' || upper(${CleanFunctions.uuid5Sql("cust", "c_custkey")}) || ' '
       |         ELSE ${CleanFunctions.uuid5Sql("cust", "c_custkey")} END AS custid,
       |    '  ' || c_name || '  ' AS name,
       |    CASE WHEN c_custkey % 9 = 0 THEN 'oops' WHEN c_custkey % 9 = 1 THEN ''
       |         ELSE CAST(c_custkey % 900 + 100 AS VARCHAR) || '.25' END AS acctbal,
       |    c_mktsegment AS segment,
       |    CASE WHEN c_custkey % 7 = 0 THEN '2024-01-15' WHEN c_custkey % 7 = 1 THEN ''
       |         ELSE CAST(c_custkey % 12 + 1 AS VARCHAR) || '/' || CAST(c_custkey % 27 + 1 AS VARCHAR) || '/2023' END AS signupdate,
       |    CASE c_custkey % 6 WHEN 0 THEN 'Yes' WHEN 1 THEN 'n' WHEN 2 THEN 'TRUE'
       |                       WHEN 3 THEN '0' WHEN 4 THEN '' ELSE 'maybe' END AS prime,
       |    CASE WHEN c_custkey % 11 = 0 THEN ${CleanFunctions.uuid5Sql("nat", "999")}
       |         ELSE ${CleanFunctions.uuid5Sql("nat", "c_nationkey")} END AS natid
       |  FROM customer),
       |trimmed AS (
       |  SELECT trim(custid) AS custid, trim(name) AS name, trim(acctbal) AS acctbal,
       |         trim(segment) AS segment, trim(signupdate) AS signupdate,
       |         trim(prime) AS prime, trim(natid) AS natid
       |  FROM staging),
       |blanked AS (
       |  SELECT NULLIF(custid, '') AS custid, NULLIF(name, '') AS name,
       |         NULLIF(acctbal, '') AS acctbal, NULLIF(segment, '') AS segment,
       |         NULLIF(signupdate, '') AS signupdate,
       |         prime,
       |         NULLIF(natid, '') AS natid
       |  FROM trimmed),
       |landed AS (SELECT * FROM blanked WHERE coalesce(regexp_matches(custid, '$U'), FALSE)),
       |badpk  AS (SELECT * FROM blanked WHERE NOT coalesce(regexp_matches(custid, '$U'), FALSE)),
       |repaired AS (
       |  SELECT ${CleanFunctions.uuid5Sql("repair:custstage",
                   "coalesce(name,chr(0)) || chr(1) || coalesce(acctbal,chr(0)) || chr(1) || coalesce(segment,chr(0)) " +
                   "|| chr(1) || coalesce(signupdate,chr(0)) || chr(1) || coalesce(prime,chr(0)) || chr(1) || coalesce(natid,chr(0))")} AS custid,
       |         name, acctbal, segment, signupdate, prime, natid
       |  FROM badpk),
       |normpk AS (
       |  SELECT lower(trim(custid)) AS custid, name, acctbal, segment, signupdate, prime, natid
       |  FROM (SELECT * FROM landed UNION ALL SELECT * FROM repaired)),
       |parents AS (SELECT DISTINCT lower(trim(${CleanFunctions.uuid5Sql("nat", "n_nationkey")})) AS natid FROM nation),
       |healed AS (
       |  SELECT n.* FROM normpk n
       |  WHERE n.natid IS NULL OR EXISTS (SELECT 1 FROM parents p WHERE p.natid = n.natid))
       |SELECT custid, name,
       |  CAST(TRY_CAST(acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal,
       |  segment,
       |  CASE WHEN regexp_matches(signupdate, '^\\d{1,2}/\\d{1,2}/\\d{4}$$')
       |       THEN CAST(strptime(signupdate, '%m/%d/%Y') AS DATE) ELSE NULL END AS signupdate,
       |  CASE WHEN lower(trim(prime)) IN ('yes','y','true','1') THEN TRUE
       |       WHEN lower(trim(prime)) IN ('no','n','false','0','') THEN FALSE
       |       ELSE NULL END AS prime,
       |  CASE WHEN regexp_matches(natid, '$U') THEN lower(trim(natid)) ELSE NULL END AS natid
       |FROM healed ORDER BY custid""".stripMargin) { (s, d) =>
    val k = col("c_custkey")
    val custUuid = CleanFunctions.uuid5("cust", k)
    val staging = Tables.customer(s, d).select(
      when(k % 10 === 0, concat(lit("BAD-"), k.cast("string")))
        .when(k % 10 === 1, concat(lit("  "), upper(custUuid), lit(" ")))
        .otherwise(custUuid).as("custid"),
      concat(lit("  "), col("c_name"), lit("  ")).as("name"),
      when(k % 9 === 0, "oops").when(k % 9 === 1, "")
        .otherwise(concat((k % 900 + 100).cast("string"), lit(".25"))).as("acctbal"),
      col("c_mktsegment").as("segment"),
      when(k % 7 === 0, "2024-01-15").when(k % 7 === 1, "")
        .otherwise(concat_ws("/", (k % 12 + 1).cast("string"),
          (k % 27 + 1).cast("string"), lit("2023"))).as("signupdate"),
      when(k % 6 === 0, "Yes").when(k % 6 === 1, "n").when(k % 6 === 2, "TRUE")
        .when(k % 6 === 3, "0").when(k % 6 === 4, "").otherwise("maybe").as("prime"),
      when(k % 11 === 0, CleanFunctions.uuid5("nat", lit(999)))
        .otherwise(CleanFunctions.uuid5("nat", col("c_nationkey"))).as("natid"))

    val natParents = Tables.nation(s, d)
      .select(CleanFunctions.uuid5("nat", col("n_nationkey")).as("nat_uuid"))
    val spec = EntitySpec(
      name = "custstage",
      pk = "custid",
      conform = Map(
        "custid" -> AsText,
        "name" -> AsText,
        "acctbal" -> AsTyped(DecimalType(12, 2)),
        "segment" -> AsText,
        "signupdate" -> AsDateMdy,
        "prime" -> AsBool,
        "natid" -> AsUuid),
      parents = Map("natid" -> (("nat_uuid", natParents))))

    IngestPipeline.run(staging, spec).clean
      .select(col("custid"), col("name"),
        col("acctbal").cast("double").as("acctbal"),
        col("segment"), col("signupdate"), col("prime"), col("natid"))
      .orderBy("custid")
  }

  val all: Seq[QueryDef] = Seq(q72)
}

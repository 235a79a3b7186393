package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Executes a multi-statement Flink SQL script — the shape of the
  * reference's /root/reference/flink/sql/sql-client.sql and the
  * README.md walkthrough — statement by statement through
  * `spark.sql(…)` (every dialect verb is a parser-level extension, so
  * the session executes each statement exactly as the SQL CLI would).
  */
object FlinkScript {

  /** Split a script into statements: quote-aware on `;`, with
    * `EXECUTE STATEMENT SET … BEGIN … END;` kept as ONE statement and
    * `--` line comments stripped.
    */
  def split(script: String): Seq[String] = {
    val noComments = script.linesIterator
      .filterNot(_.trim.startsWith("--")).mkString("\n")
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inStr = false
    var i = 0
    def inStatementSet: Boolean = {
      val up = cur.toString.trim.toUpperCase
      if (!up.startsWith("EXECUTE STATEMENT SET")) return false
      // the block closes only when the text after the LAST completed
      // statement is exactly the keyword END: `BEGIN stmt; …; END;`.
      // A bare suffix test closes at any inner statement merely ending
      // in "end" (a column `trend`/`weekend`, an APPEND hint) — and a
      // word-boundary test still closes mid-block at a SQL
      // `CASE … END` expression, which sits INSIDE an unterminated
      // statement and therefore never stands alone after a ';'
      val afterLastStmt = up.substring(up.lastIndexOf(';') + 1).trim
      afterLastStmt != "END"
    }
    while (i < noComments.length) {
      val c = noComments.charAt(i)
      if (c == '\'') { inStr = !inStr; cur.append(c) }
      else if (c == ';' && !inStr && !inStatementSet) {
        out += cur.toString; cur.clear()
      }
      else cur.append(c)
      i += 1
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Run every statement; returns (statement, result) pairs. */
  def run(spark: SparkSession, script: String): Seq[(String, DataFrame)] =
    split(script).map(s => s -> spark.sql(s))

  /** The reference's faker-source DDL + sink policy, verbatim
    * (/root/reference/flink/sql/sql-client.sql:1-50).
    */
  val referenceSqlClientScript: String =
    """CREATE TEMPORARY TABLE source_order (
      |    `order_key` BIGINT,
      |    `cust_key` INT,
      |    `total_price` DECIMAL(15, 2),
      |    `order_date` DATE,
      |    `order_priority` STRING,
      |    `clerk` STRING
      |) WITH (
      |  'connector' = 'faker',
      |  'rows-per-second' = '10',
      |  'number-of-rows' = '10000',
      |  'fields.order_key.expression' = '#{number.numberBetween ''0'',''100000000''}',
      |  'fields.cust_key.expression' = '#{number.numberBetween ''0'',''20''}',
      |  'fields.total_price.expression' = '#{number.randomDouble ''3'',''1'',''1000''}',
      |  'fields.order_date.expression' = '#{date.past ''100'' ''DAYS''}',
      |  'fields.order_priority.expression' = '#{regexify ''(low|medium|high){1}''}',
      |  'fields.clerk.expression' = '#{regexify ''(Clerk1|Clerk2|Clerk3|Clerk4){1}''}'
      |);
      |
      |CREATE TEMPORARY TABLE source_customer (
      |    `cust_key` INT,
      |    `name` STRING,
      |    `phone` STRING,
      |    `nation_key` INT NOT NULL,
      |    `acctbal` DECIMAL(15, 2),
      |    `mktsegment` STRING,
      |    PRIMARY KEY (`cust_key`) NOT ENFORCED
      |) WITH (
      |  'connector' = 'faker',
      |  'number-of-rows' = '200',
      |  'fields.cust_key.expression' = '#{number.numberBetween ''0'',''20''}',
      |  'fields.name.expression' = '#{funnyName.name}',
      |  'fields.nation_key.expression' = '#{number.numberBetween ''1'',''20''}',
      |  'fields.phone.expression' = '#{phoneNumber.cellPhone}',
      |  'fields.acctbal.expression' = '#{number.randomDouble ''3'',''1'',''1000''}',
      |  'fields.mktsegment.expression' = '#{regexify ''(AUTOMOBILE|BUILDING|FURNITURE|MACHINERY|HOUSEHOLD){1}''}'
      |);
      |
      |CREATE TEMPORARY TABLE `source_nation` (
      |  `nation_key` INT NOT NULL,
      |  `name`       STRING,
      |   PRIMARY KEY (`nation_key`) NOT ENFORCED
      |) WITH (
      |  'connector' = 'faker',
      |  'number-of-rows' = '100',
      |  'fields.nation_key.expression' = '#{number.numberBetween ''1'',''20''}',
      |  'fields.name.expression' = '#{regexify ''(CANADA|JORDAN|CHINA|UNITED|INDIA|BRAZIL|GERMANY|FRANCE|JAPAN|AUSTRALIA|SOUTHAFRICA|ITALY|ARGENTINA|RUSSIA|SPAIN|MEXICO|KOREA|NETHERLANDS|SWEDEN|NORWAY){1}''}'
      |);
      |
      |SET 'table.exec.sink.not-null-enforcer'='DROP';
      |""".stripMargin

  /** The README walkthrough steps 3–4, verbatim
    * (/root/reference/README.md:127-251): catalog, Flink-dialect
    * tables (PROCTIME column, PK NOT ENFORCED, datalake properties),
    * the EXECUTE STATEMENT SET loads, the temporal-join enrichment and
    * the continuously-maintained revenue INSERT. The one explicit
    * addition is `SET 'execution.runtime-mode' = 'streaming'` — the
    * Flink SQL client's implicit default for unbounded INSERTs.
    */
  val referenceWalkthroughScript: String =
    """CREATE CATALOG fluss_catalog WITH (
      |    'type' = 'fluss',
      |    'bootstrap.servers' = 'coordinator-server:9123'
      |);
      |
      |USE CATALOG fluss_catalog;
      |
      |SET 'execution.runtime-mode' = 'streaming';
      |
      |CREATE TABLE fluss_order (
      |    `order_key` BIGINT,
      |    `cust_key` INT NOT NULL,
      |    `total_price` DECIMAL(15, 2),
      |    `order_date` DATE,
      |    `order_priority` STRING,
      |    `clerk` STRING,
      |    `ptime` AS PROCTIME()
      |);
      |
      |CREATE TABLE fluss_customer (
      |    `cust_key` INT NOT NULL,
      |    `name` STRING,
      |    `phone` STRING,
      |    `nation_key` INT NOT NULL,
      |    `acctbal` DECIMAL(15, 2),
      |    `mktsegment` STRING,
      |    PRIMARY KEY (`cust_key`) NOT ENFORCED
      |);
      |
      |CREATE TABLE fluss_nation (
      |    `nation_key` INT NOT NULL,
      |    `name` STRING,
      |    PRIMARY KEY (`nation_key`) NOT ENFORCED
      |);
      |
      |CREATE TABLE enriched_orders (
      |    `order_key` BIGINT,
      |    `cust_key` INT NOT NULL,
      |    `total_price` DECIMAL(15, 2),
      |    `order_date` DATE,
      |    `order_priority` STRING,
      |    `clerk` STRING,
      |    `cust_name` STRING,
      |    `cust_phone` STRING,
      |    `cust_acctbal` DECIMAL(15, 2),
      |    `cust_mktsegment` STRING,
      |    `nation_name` STRING,
      |    `ingest_ts` TIMESTAMP_LTZ
      |) WITH (
      |    'table.datalake.enabled' = 'true',
      |    'table.datalake.freshness' = '30s'
      |);
      |
      |CREATE TABLE nation_revenue (
      |    `nation_name` STRING,
      |    `revenue` DECIMAL(15, 2),
      |    PRIMARY KEY (`nation_name`) NOT ENFORCED
      |) WITH (
      |    'table.datalake.enabled' = 'true',
      |    'table.datalake.freshness' = '30s'
      |);
      |
      |EXECUTE STATEMENT SET
      |BEGIN
      |    INSERT INTO fluss_nation SELECT * FROM `default_catalog`.`default_database`.source_nation;
      |    INSERT INTO fluss_customer SELECT * FROM `default_catalog`.`default_database`.source_customer;
      |    INSERT INTO fluss_order SELECT * FROM `default_catalog`.`default_database`.source_order;
      |END;
      |
      |INSERT INTO enriched_orders
      |SELECT o.order_key,
      |       o.cust_key,
      |       o.total_price,
      |       o.order_date,
      |       o.order_priority,
      |       o.clerk,
      |       c.name,
      |       c.phone,
      |       c.acctbal,
      |       c.mktsegment,
      |       n.name,
      |       CURRENT_TIMESTAMP as ingest_ts
      |FROM fluss_order o
      |       LEFT JOIN fluss_customer FOR SYSTEM_TIME AS OF `o`.`ptime` AS `c`
      |                 ON o.cust_key = c.cust_key
      |       LEFT JOIN fluss_nation FOR SYSTEM_TIME AS OF `o`.`ptime` AS `n`
      |                 ON c.nation_key = n.nation_key;
      |
      |INSERT INTO nation_revenue
      |SELECT nation_name, SUM(total_price) as revenue
      |FROM enriched_orders
      |GROUP BY nation_name;
      |""".stripMargin
}

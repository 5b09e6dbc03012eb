package graft

import java.nio.file.{Files, Path, Paths}
import java.security.KeyStore
import java.security.cert.CertificateFactory
import java.security.spec.PKCS8EncodedKeySpec
import java.util.Base64
import java.util.concurrent.CountDownLatch
import javax.net.ssl.{KeyManagerFactory, SSLContext}
import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession

import graft.pgwire.{AuthManager, PgServer}

/** The product entry point: serve CSV/JSON/Parquet/Arrow/Avro files as
  * tables over the PostgreSQL wire protocol — the reference's CLI shape
  * (reference: datafusion-postgres-cli/src/main.rs:55-191: `--csv
  * name:path`, `--json`, `--parquet`, `--arrow`, `--avro`, `--dir`,
  * `-p`, `--host`, `--tls-cert`/`--tls-key`).
  *
  * Differences from the reference, stated up front:
  *  - `--arrow`/`--avro` read via the in-distribution arrow-vector /
  *    avro jars and materialize on the driver with a 1 GiB guard
  *    (graft.sources.ArrowAvroSources) — registration-sized files,
  *    same as the reference CLI's usage; big data goes through the
  *    distributed parquet path.
  *  - extra flags the reference configures elsewhere: `--auth`
  *    (trust|cleartext|md5|scram-sha-256), `--user name:password`
  *    (repeatable), `--max-connections`, `--master`.
  *
  * Example:
  * {{{
  * java -cp ... graft.Cli --parquet lineitem:/data/lineitem.parquet \
  *   --csv dim:/data/dim.csv -p 5433
  * psql -h 127.0.0.1 -p 5433 -c 'SELECT count(*) FROM lineitem'
  * }}}
  */
object Cli {

  private case class Opts(
      csv: Vector[(String, String)] = Vector.empty,
      json: Vector[(String, String)] = Vector.empty,
      parquet: Vector[(String, String)] = Vector.empty,
      arrow: Vector[(String, String)] = Vector.empty,
      avro: Vector[(String, String)] = Vector.empty,
      dir: Option[String] = None,
      host: String = "127.0.0.1",
      port: Int = 5432,
      tlsCert: Option[String] = None,
      tlsKey: Option[String] = None,
      authMethod: String = "trust",
      users: Vector[(String, String)] = Vector.empty,
      maxConnections: Int = 64,
      master: String = "local[*]")

  private val usage =
    """usage: graft.Cli [options]
      |  --csv name:path       register a CSV file as table `name` (repeatable)
      |  --json name:path      register a JSON-lines file as table `name` (repeatable)
      |  --parquet name:path   register a Parquet file/dir as table `name` (repeatable)
      |  --arrow name:path     register an Arrow IPC file as table `name` (repeatable)
      |  --avro name:path      register an Avro container file as table `name` (repeatable)
      |  --dir path, -d path   register every .csv/.json/.parquet/.arrow/.avro
      |                        file in path, table name = file stem
      |  -p port               listen port (default 5432)
      |  --host addr           bind address (default 127.0.0.1)
      |  --tls-cert path       PEM certificate (chain) — enables TLS with --tls-key
      |  --tls-key path        PEM PKCS#8 private key
      |  --auth method         trust | cleartext | md5 | scram-sha-256 (default trust)
      |  --user name:password[:role]
      |                        add a login user (repeatable); role is one of
      |                        readonly | readwrite | dbadmin (default readwrite)
      |  --max-connections n   concurrent connection cap (default 64)
      |  --master url          Spark master (default local[*])
      |""".stripMargin

  private def splitDef(s: String, flag: String): (String, String) =
    s.indexOf(':') match {
      case i if i > 0 => (s.substring(0, i), s.substring(i + 1))
      case _ => throw new IllegalArgumentException(
        s"$flag expects table_name:file_path, got '$s'")
    }

  private def parse(args: List[String], o: Opts): Opts = args match {
    case Nil => o
    case "--csv" :: v :: rest => parse(rest, o.copy(csv = o.csv :+ splitDef(v, "--csv")))
    case "--json" :: v :: rest => parse(rest, o.copy(json = o.json :+ splitDef(v, "--json")))
    case "--parquet" :: v :: rest => parse(rest, o.copy(parquet = o.parquet :+ splitDef(v, "--parquet")))
    case "--arrow" :: v :: rest => parse(rest, o.copy(arrow = o.arrow :+ splitDef(v, "--arrow")))
    case "--avro" :: v :: rest => parse(rest, o.copy(avro = o.avro :+ splitDef(v, "--avro")))
    case ("--dir" | "-d") :: v :: rest => parse(rest, o.copy(dir = Some(v)))
    case "-p" :: v :: rest => parse(rest, o.copy(port = v.toInt))
    case "--port" :: v :: rest => parse(rest, o.copy(port = v.toInt))
    case "--host" :: v :: rest => parse(rest, o.copy(host = v))
    case "--tls-cert" :: v :: rest => parse(rest, o.copy(tlsCert = Some(v)))
    case "--tls-key" :: v :: rest => parse(rest, o.copy(tlsKey = Some(v)))
    case "--auth" :: v :: rest => parse(rest, o.copy(authMethod = v))
    case "--user" :: v :: rest => parse(rest, o.copy(users = o.users :+ splitDef(v, "--user")))
    case "--max-connections" :: v :: rest => parse(rest, o.copy(maxConnections = v.toInt))
    case "--master" :: v :: rest => parse(rest, o.copy(master = v))
    case ("--help" | "-h") :: _ => println(usage); sys.exit(0)
    case bad :: _ => throw new IllegalArgumentException(s"unknown option '$bad'\n$usage")
  }

  /** Expand --dir into per-extension table defs (reference
    * main.rs:63-121: file stem → table name, extension → format). */
  private def expandDir(o: Opts): Opts = o.dir match {
    case None => o
    case Some(d) =>
      val p = Paths.get(d)
      require(Files.isDirectory(p), s"--dir $d is not a directory")
      var out = o
      Files.list(p).iterator().asScala.filter(Files.isRegularFile(_)).foreach { f =>
        val name = f.getFileName.toString
        val dot = name.lastIndexOf('.')
        if (dot > 0) {
          val (stem, ext) = (name.substring(0, dot), name.substring(dot + 1).toLowerCase)
          val defn = (stem, f.toString)
          ext match {
            case "csv" => out = out.copy(csv = out.csv :+ defn)
            case "json" => out = out.copy(json = out.json :+ defn)
            case "parquet" => out = out.copy(parquet = out.parquet :+ defn)
            case "arrow" | "arrows" => out = out.copy(arrow = out.arrow :+ defn)
            case "avro" => out = out.copy(avro = out.avro :+ defn)
            case _ => // not a table file
          }
        }
      }
      out
  }

  /** Build an SSLContext from PEM cert chain + PKCS#8 key — the
    * reference takes the same two file paths (main.rs:104-107,
    * lib.rs setup_tls). */
  private[graft] def tlsContext(certPath: String, keyPath: String): SSLContext = {
    val cf = CertificateFactory.getInstance("X.509")
    val certIn = Files.newInputStream(Paths.get(certPath))
    val chain = try cf.generateCertificates(certIn).asScala.toArray
                finally certIn.close()
    val pem = Files.readString(Paths.get(keyPath))
    val b64 = pem.linesIterator
      .filterNot(l => l.startsWith("-----") || l.isBlank).mkString
    val der = Base64.getDecoder.decode(b64)
    val spec = new PKCS8EncodedKeySpec(der)
    val key = Seq("RSA", "EC", "Ed25519").view.flatMap { alg =>
      try Some(java.security.KeyFactory.getInstance(alg).generatePrivate(spec))
      catch { case NonFatal(_) => None }
    }.headOption.getOrElse(
      throw new IllegalArgumentException(s"$keyPath: not an RSA/EC/Ed25519 PKCS#8 key"))
    val ks = KeyStore.getInstance("PKCS12")
    ks.load(null, null)
    ks.setKeyEntry("pg", key, Array.emptyCharArray, chain.map(_.asInstanceOf[java.security.cert.Certificate]))
    val kmf = KeyManagerFactory.getInstance("SunX509")
    kmf.init(ks, Array.emptyCharArray)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }

  /** Register every table def as a temp view. Lazy (schema read only). */
  private[graft] def registerTables(spark: SparkSession, o: Opts): Unit = {
    o.csv.foreach { case (name, path) =>
      spark.read.option("header", "true").option("inferSchema", "true")
        .csv(path).createOrReplaceTempView(name)
      System.err.println(s"[graft] loaded $path as table $name (csv)")
    }
    o.json.foreach { case (name, path) =>
      spark.read.json(path).createOrReplaceTempView(name)
      System.err.println(s"[graft] loaded $path as table $name (json)")
    }
    o.parquet.foreach { case (name, path) =>
      spark.read.parquet(path).createOrReplaceTempView(name)
      System.err.println(s"[graft] loaded $path as table $name (parquet)")
    }
    o.arrow.foreach { case (name, path) =>
      graft.sources.ArrowAvroSources.readArrow(spark, path).createOrReplaceTempView(name)
      System.err.println(s"[graft] loaded $path as table $name (arrow)")
    }
    o.avro.foreach { case (name, path) =>
      graft.sources.ArrowAvroSources.readAvro(spark, path).createOrReplaceTempView(name)
      System.err.println(s"[graft] loaded $path as table $name (avro)")
    }
  }

  /** Everything main does except block: parse, build/reuse the session,
    * register tables, start the server. Separated so tests can drive
    * the real arg-parse→serve path against an ephemeral port. */
  private[graft] def serve(args: Array[String]): (SparkSession, PgServer) = {
    val o = expandDir(parse(args.toList, Opts()))
    require(o.tlsCert.isDefined == o.tlsKey.isDefined,
      "--tls-cert and --tls-key must be given together")

    val spark = SparkSession.builder()
      .appName("graft-pg")
      .master(o.master)
      .config("spark.sql.shuffle.partitions",
        Runtime.getRuntime.availableProcessors().toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config(Tables.sessionConfs)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    registerTables(spark, o)

    val auth = new AuthManager()
    o.users.foreach { case (name, passAndRole) =>
      val (pass, role) = passAndRole.indexOf(':') match {
        case -1 => (passAndRole, "readwrite")
        case i => (passAndRole.substring(0, i), passAndRole.substring(i + 1))
      }
      auth.createUser(name, Some(pass))
      auth.grantRole(role, name)
    }
    val server = new PgServer(
      spark,
      host = o.host,
      port = o.port,
      maxConnections = o.maxConnections,
      authMethod = o.authMethod,
      auth = auth,
      tls = o.tlsCert.map(c => tlsContext(c, o.tlsKey.get)))
    server.start()
    System.err.println(
      s"[graft] serving pg wire protocol on ${o.host}:${server.boundPort}" +
        (if (o.tlsCert.isDefined) " (TLS enabled)" else ""))
    (spark, server)
  }

  def main(args: Array[String]): Unit = {
    val (spark, server) = serve(args)
    val done = new CountDownLatch(1)
    sys.addShutdownHook { server.stop(); spark.stop(); done.countDown() }
    done.await() // serve until killed
  }
}

package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, ObjectInputStream, ObjectOutputStream}

/** Hadoop Configuration that survives Spark task serialization.
  *
  * Index-artifact tasks run on executors that may not share the driver's
  * filesystem; routing every byte through the Hadoop [[FileSystem]] API with
  * the driver's configuration (credentials, fs.defaultFS, scheme impls) is
  * what makes the artifacts land on HDFS/S3/file:// uniformly — the
  * Spark-native analog of the reference's `io.Writer` persistence boundary
  * (`/root/reference/index/hnsw_persistence.go:30`).
  */
class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

/** Small-artifact I/O through the Hadoop FileSystem API. Paths are plain
  * strings and may carry any scheme (`file:///tmp/x`, `hdfs://nn/x`,
  * `s3a://bucket/x`); scheme-less paths resolve against `fs.defaultFS`.
  */
object HadoopIO {

  def mkdirs(dir: String, conf: Configuration): Unit = {
    val p = new Path(dir)
    p.getFileSystem(conf).mkdirs(p)
  }

  def exists(path: String, conf: Configuration): Boolean = {
    val p = new Path(path)
    p.getFileSystem(conf).exists(p)
  }

  /** Write an artifact atomically-ish: stream to `<path>.inprogress`, then
    * rename over the target. A reader never observes a torn file, and a
    * failed/retried task leaves only the temp to be overwritten by the retry.
    */
  def write[A](path: String, conf: Configuration)(f: DataOutputStream => A): A = {
    val target = new Path(path)
    val fs = target.getFileSystem(conf)
    val tmp = new Path(path + ".inprogress")
    val out = new DataOutputStream(new BufferedOutputStream(fs.create(tmp, true)))
    val res =
      try f(out)
      finally out.close()
    if (fs.exists(target)) fs.delete(target, false)
    if (!fs.rename(tmp, target)) throw new java.io.IOException(s"rename $tmp -> $target failed")
    res
  }

  def read[A](path: String, conf: Configuration)(f: DataInputStream => A): A = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val in = new DataInputStream(new BufferedInputStream(fs.open(p)))
    try f(in)
    finally in.close()
  }

  /** Fully-qualified URIs of artifacts matching `dir/<glob>`, sorted.
    * The executor-side loader re-resolves the scheme from the URI, so a
    * listing taken on the driver is directly usable in tasks.
    */
  def glob(dir: String, pattern: String, conf: Configuration): Seq[String] = {
    val p = new Path(dir, pattern)
    val fs = p.getFileSystem(conf)
    Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
      .filter(_.isFile)
      .map(st => fs.makeQualified(st.getPath).toString)
      .sorted
  }
}

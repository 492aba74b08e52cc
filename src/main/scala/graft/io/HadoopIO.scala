package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, FilterOutputStream, IOException, ObjectInputStream, ObjectOutputStream, OutputStream}
import java.util.zip.{CRC32, CheckedInputStream, CheckedOutputStream}

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

  /** Byte counter that survives >2 GiB artifacts (DataOutputStream.size()
    * is an Int and saturates).
    */
  private final class CountingOutputStream(out: OutputStream) extends FilterOutputStream(out) {
    var count: Long = 0L
    override def write(b: Int): Unit = { out.write(b); count += 1 }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      out.write(b, off, len); count += len
    }
  }

  /** [[write]] that also reports what landed: (result, byte length, CRC32).
    * The length/checksum feed a save-time manifest so a later load can
    * prove the artifact set is complete and untorn.
    */
  def writeChecked[A](path: String, conf: Configuration)(f: DataOutputStream => A): (A, Long, Long) = {
    val target = new Path(path)
    val fs = target.getFileSystem(conf)
    val tmp = new Path(path + ".inprogress")
    val crc = new CRC32()
    val counting = new CountingOutputStream(new BufferedOutputStream(fs.create(tmp, true)))
    val out = new DataOutputStream(new CheckedOutputStream(counting, crc))
    val res =
      try f(out)
      finally out.close()
    if (fs.exists(target)) fs.delete(target, false)
    if (!fs.rename(tmp, target)) throw new IOException(s"rename $tmp -> $target failed")
    (res, counting.count, crc.getValue)
  }

  /** [[read]] verifying the artifact's CRC32 against a manifest value:
    * after `f` consumes the logical content, the stream is drained to EOF
    * and the full-file checksum compared — a corrupted or partially
    * overwritten artifact fails LOUDLY here instead of silently serving
    * wrong search results. `expectedCrc < 0` skips verification (legacy
    * manifest entries of unknown checksum).
    */
  def readChecked[A](path: String, conf: Configuration, expectedCrc: Long)(f: DataInputStream => A): A = {
    if (expectedCrc < 0) return read(path, conf)(f)
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val crc = new CRC32()
    val in = new DataInputStream(new CheckedInputStream(new BufferedInputStream(fs.open(p)), crc))
    try {
      val res = f(in)
      val sink = new Array[Byte](8192)
      while (in.read(sink) >= 0) {}
      if (crc.getValue != expectedCrc)
        throw new IOException(
          s"artifact $path checksum ${crc.getValue} != manifest $expectedCrc (corrupt or torn)")
      res
    } finally in.close()
  }

  def read[A](path: String, conf: Configuration)(f: DataInputStream => A): A = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val in = new DataInputStream(new BufferedInputStream(fs.open(p)))
    try f(in)
    finally in.close()
  }

  /** Recursive delete. Returns false when the path did not exist. */
  def delete(path: String, conf: Configuration): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    fs.exists(p) && fs.delete(p, true)
  }

  /** Rename (move) a path; fails loudly — rename is the primitive whose
    * silent failure would strand a directory swap half-done.
    */
  def rename(src: String, dst: String, conf: Configuration): Unit = {
    val s = new Path(src)
    val fs = s.getFileSystem(conf)
    if (!fs.rename(s, new Path(dst)))
      throw new IOException(s"rename $src -> $dst failed")
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

  /** Like [[glob]] but matching DIRECTORIES — returns the bare directory
    * names (last path segment), sorted. Used by compactions to sweep
    * on-disk segment dirs a crashed earlier compaction orphaned (the
    * manifest-derived segment list cannot see them).
    */
  def globDirNames(dir: String, pattern: String, conf: Configuration): Seq[String] = {
    val p = new Path(dir, pattern)
    val fs = p.getFileSystem(conf)
    Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .sorted
  }

  /** [[glob]] carrying each artifact's current byte length, sorted by URI —
    * the driver-side half of manifest validation (a short file is caught
    * here without reading a byte of it).
    */
  def globWithLength(dir: String, pattern: String, conf: Configuration): Seq[(String, Long)] = {
    val p = new Path(dir, pattern)
    val fs = p.getFileSystem(conf)
    Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
      .filter(_.isFile)
      .map(st => (fs.makeQualified(st.getPath).toString, st.getLen))
      .sortBy(_._1)
  }
}

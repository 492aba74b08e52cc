package graft.io

import org.apache.hadoop.conf.Configuration

/** One persisted-index artifact as the save-time job knew it.
  * `crc < 0` means "checksum unknown" (entry inherited from a
  * pre-manifest save) — loaders then validate name + length only.
  */
case class ManifestEntry(name: String, length: Long, crc: Long)

/** Completeness manifest for a directory of per-partition index artifacts.
  *
  * A partitioned index save (`HnswSpark.buildAndSave` and friends) emits one
  * file per partition; loaders discover them by glob. Without a manifest, an
  * artifact lost to a torn copy or partial delete makes search **silently
  * return low-recall results** — the glob simply sees fewer graphs. The
  * reference never has this failure mode because it serves from an explicit
  * partition registry (`/root/reference/storage/dataset.go:349-433` fans out
  * over a known partition list); this manifest is that registry for the
  * artifact directory: expected file set + per-file length + CRC32, written
  * by the same job that wrote the artifacts, validated on every load.
  *
  * Format (big-endian, via [[HadoopIO.write]]'s atomic rename): magic,
  * version, entry count, then per entry UTF name + length + crc.
  */
object Manifest {

  val FileName = "_manifest"
  private val Magic = 0x474d4e46 // "GMNF"
  private val Version = 1

  def write(dir: String, entries: Seq[ManifestEntry], conf: Configuration): Unit =
    HadoopIO.write(s"$dir/$FileName", conf) { out =>
      out.writeInt(Magic)
      out.writeInt(Version)
      val sorted = entries.sortBy(_.name)
      out.writeInt(sorted.size)
      sorted.foreach { e =>
        out.writeUTF(e.name)
        out.writeLong(e.length)
        out.writeLong(e.crc)
      }
    }

  /** None ONLY when no manifest file exists (a pre-manifest save); an
    * unreadable manifest PROPAGATES — defaulting there would turn a corrupt
    * registry back into the silent-missing-partition failure it prevents.
    */
  def read(dir: String, conf: Configuration): Option[Seq[ManifestEntry]] = {
    val path = s"$dir/$FileName"
    if (!HadoopIO.exists(path, conf)) None
    else Some(HadoopIO.read(path, conf) { in =>
      require(in.readInt() == Magic, s"bad manifest magic in $path")
      val v = in.readInt()
      require(v == Version, s"unsupported manifest version $v in $path")
      val n = in.readInt()
      (0 until n).map(_ => ManifestEntry(in.readUTF(), in.readLong(), in.readLong()))
    })
  }

  /** Validate a glob listing against the manifest; returns (uri, expected
    * crc) per artifact, in manifest order. Fails loudly on a missing,
    * extra, or wrong-length artifact. A directory without a manifest
    * passes through with unknown checksums (legacy saves stay loadable).
    */
  def validate(
      dir: String,
      listed: Seq[(String, Long)], // (qualified uri, current length)
      conf: Configuration): Seq[(String, Long)] =
    read(dir, conf) match {
      case None => listed.map { case (uri, _) => (uri, -1L) }
      case Some(entries) =>
        val byName = listed.map { case (uri, len) => (baseName(uri), (uri, len)) }.toMap
        val missing = entries.filterNot(e => byName.contains(e.name))
        require(missing.isEmpty,
          s"index at $dir is INCOMPLETE: manifest lists ${entries.size} artifacts, " +
            s"missing [${missing.map(_.name).mkString(", ")}] — refusing to serve partial results")
        val extra = byName.keySet -- entries.map(_.name).toSet
        require(extra.isEmpty,
          s"index at $dir has artifacts not in its manifest: [${extra.toSeq.sorted.mkString(", ")}] " +
            "— stale or foreign files would silently change results")
        entries.map { e =>
          val (uri, len) = byName(e.name)
          require(len == e.length,
            s"artifact ${e.name} at $dir is ${len}B, manifest says ${e.length}B (torn save)")
          (uri, e.crc)
        }
    }

  def baseName(uri: String): String = uri.substring(uri.lastIndexOf('/') + 1)
}

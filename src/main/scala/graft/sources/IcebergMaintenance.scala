package graft.sources

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import IcebergSnapshot.{parseSnapshots, pathKey, readManifestList, readText}

/** Table MAINTENANCE beyond snapshot expiry: orphan-file removal —
  * the janitor a long-lived table needs because the commit protocol
  * is deliberately crash-tolerant. A writer that dies between writing
  * its data/manifest/metadata files and flipping `version-hint.text`
  * leaves everything it wrote UNREFERENCED (the next reader never sees
  * it — correctness holds), and an abandoned WAP stage's dropped ref
  * releases snapshots whose files expiry may never visit. At 100 TB
  * that garbage is real money; a real Iceberg deployment runs
  * `remove_orphan_files` on a schedule for exactly this reason
  * (reference north-star: the Iceberg table layout the converter
  * targets, `/root/reference/db2ice/converter.py:166-183`).
  *
  * Safety model (matching the Iceberg procedure's contract):
  *   - only files STRICTLY OLDER than `olderThanMs` are candidates —
  *     an in-flight writer's freshly-written-but-not-yet-committed
  *     files are never swept (pass a cutoff comfortably behind the
  *     longest plausible commit, e.g. now - 24h);
  *   - the reachable set spans EVERY snapshot in the current metadata
  *     (staged WAP branch heads included — they are in the snapshots
  *     array and ref-protected from expiry, so their files are live),
  *     and every entry of every reachable manifest regardless of
  *     status (a tombstoned path is still readable through an older
  *     retained snapshot's time travel);
  *   - metadata versions ≤ the current hint are history (metadata-log
  *     entries point at them); versions ABOVE the hint are crashed
  *     commit attempts and age out like any other orphan;
  *   - hidden files (`.`/`_` prefixed: Spark `_SUCCESS`, Hadoop
  *     checksums) are never touched.
  *
  * Driver-side O(manifests + files-on-disk) listing, the same shape
  * as the real action's file-listing phase. Idempotent: a second run
  * over a clean table deletes nothing.
  */
object IcebergMaintenance {

  /** Delete unreferenced files under `tablePath` older than
    * `olderThanMs` (epoch millis, exclusive). Returns the deleted
    * paths. See the object scaladoc for the safety contract. */
  def removeOrphanFiles(tablePath: String, olderThanMs: Long,
      conf: Configuration = new Configuration()): Seq[String] = {
    val metadataDir = new Path(tablePath, "metadata")
    val fs = FileSystem.get(metadataDir.toUri, conf)
    val hintPath = new Path(metadataDir, "version-hint.text")
    require(fs.exists(hintPath),
      s"$tablePath is not an Iceberg table (no version hint) — refusing to sweep")
    val version = readText(hintPath, conf).trim.toInt
    val metaText = readText(
      new Path(metadataDir, s"v$version.metadata.json"), conf)
    val chain = parseSnapshots(metaText)

    // reachable = manifest lists ∪ manifests ∪ every file path any
    // manifest entry records (all statuses), across the WHOLE chain
    val lists = chain.map(s => pathKey(s.manifestList)).toSet
    val manifestPaths = chain.flatMap(s =>
      readManifestList(new Path(s.manifestList), conf)
        .map(_.get("manifest_path").toString)).distinct
    val manifests = manifestPaths.map(pathKey).toSet
    val dataFiles = manifestPaths.flatMap(m =>
      IcebergSnapshot.readManifestPaths(new Path(m), conf).map(pathKey)).toSet
    val metaJson = "v(\\d+)\\.metadata\\.json".r

    val deleted = ArrayBuffer.empty[String]
    val it = fs.listFiles(new Path(tablePath), true)
    while (it.hasNext) {
      val st = it.next()
      val p = st.getPath
      val key = pathKey(p.toString)
      val keep =
        p.getName.startsWith(".") || p.getName.startsWith("_") ||
        p.getName == "version-hint.text" ||
        (metaJson.findFirstMatchIn(p.getName) match {
          case Some(m) if p.getParent.getName == "metadata" =>
            m.group(1).toInt <= version
          case _ => false
        }) ||
        lists.contains(key) || manifests.contains(key) ||
        dataFiles.contains(key) ||
        st.getModificationTime >= olderThanMs
      if (!keep) {
        fs.delete(p, false)
        deleted += p.toString
      }
    }
    deleted.toSeq
  }
}

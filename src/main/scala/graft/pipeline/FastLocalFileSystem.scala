package graft.pipeline

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.hadoop.fs.RawLocalFileSystem
import org.apache.hadoop.fs.permission.FsPermission
import java.nio.file.{Files, Paths}
import java.nio.file.attribute.PosixFilePermission
import java.util.{EnumSet => JEnumSet}

/**
 * `file://` implementation for local/tmpfs scratch space whose
 * permission operations run through java.nio instead of forking
 * `chmod` subprocesses: without the Hadoop native library (absent in
 * this image — NativeCodeLoader warns at startup) the stock
 * RawLocalFileSystem shells out for every setPermission, and every
 * parquet file/dir create calls it. Measured during the scaling bench:
 * 26 of 32 executor threads simultaneously inside
 * ProcessImpl.forkAndExec — a fork storm from an 8 GB pre-touched
 * heap that collapsed 32-thread utilization to ~25%.
 *
 * Registering this class directly (rather than the ChecksumFileSystem
 * wrapper) also drops `.crc` sidecars, which double the file count for
 * no value on scratch space. Configure with
 * `spark.hadoop.fs.file.impl=graft.pipeline.FastLocalFileSystem`.
 * On a real cluster the data path is HDFS/S3 and this class is unused.
 */
final class FastLocalFileSystem extends RawLocalFileSystem {

  override def setPermission(p: HPath, permission: FsPermission): Unit = {
    val path = Paths.get(p.toUri.getPath)
    val bits: Int = permission.toShort.toInt
    val set = JEnumSet.noneOf(classOf[PosixFilePermission])
    import PosixFilePermission._
    if ((bits & 0x100) != 0) set.add(OWNER_READ)
    if ((bits & 0x080) != 0) set.add(OWNER_WRITE)
    if ((bits & 0x040) != 0) set.add(OWNER_EXECUTE)
    if ((bits & 0x020) != 0) set.add(GROUP_READ)
    if ((bits & 0x010) != 0) set.add(GROUP_WRITE)
    if ((bits & 0x008) != 0) set.add(GROUP_EXECUTE)
    if ((bits & 0x004) != 0) set.add(OTHERS_READ)
    if ((bits & 0x002) != 0) set.add(OTHERS_WRITE)
    if ((bits & 0x001) != 0) set.add(OTHERS_EXECUTE)
    Files.setPosixFilePermissions(path, set)
  }
}

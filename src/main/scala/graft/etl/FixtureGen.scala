package graft.etl

import java.io.PrintWriter
import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import java.time.Instant
import java.util.UUID

import scala.util.Random

/** Deterministic LogiCash fixture generator — behavioral equivalent of the
  * reference's mock-data producer (ref `data_gen/generator.py`): seeded,
  * same schemas, same injected-error rates (1% null FK, 1% future dates,
  * 2% negative amounts, 10% non-EXITOSA status), same batch layout
  * (timestamped CSVs under `dim_atms/` and `fact_transactions/`, `_READY`
  * flag written LAST, ref `generator.py:177-191,311-314`). Fresh
  * implementation — rates and shapes from SURVEY.md §1/§5, no code reuse.
  */
object FixtureGen {
  final case class Rates(
      nullFk: Double = 0.01,
      futureDate: Double = 0.01,
      negativeAmount: Double = 0.02,
      failedStatus: Double = 0.10)

  /** @return (nDims, nFacts) written */
  def write(
      root: String,
      nAtms: Int = 50,
      nTx: Int = 10000,
      seed: Long = 42L,
      clock: Timestamp = Timestamp.from(Instant.parse("2026-01-01T00:00:00Z")),
      rates: Rates = Rates()): (Int, Int) = {
    val rnd = new Random(seed)
    val dimDir = Paths.get(root, "dim_atms")
    val factDir = Paths.get(root, "fact_transactions")
    Files.createDirectories(dimDir)
    Files.createDirectories(factDir)

    val modelos = Seq("NCR", "Diebold", "Hyosung", "Wincor Nixdorf")
    val atmIds = (1 to nAtms).map(i => f"ATM-$i%03d")

    val dimCsv = new PrintWriter(dimDir.resolve("dim_atms_20260101_000000.csv").toFile)
    dimCsv.println("id_atm,ubicacion,latitud,longitud,capacidad_maxima,modelo,estado")
    atmIds.foreach { id =>
      val lat = -12.20 + rnd.nextDouble() * 0.30
      val lon = -77.15 + rnd.nextDouble() * 0.25
      val cap = Seq(100000, 500000, 1000000)(rnd.nextInt(3))
      val modelo = modelos(rnd.nextInt(modelos.size))
      val estado = rnd.nextDouble() match {
        case d if d < 0.92 => "OPERATIVO"
        case d if d < 0.97 => "MANTENIMIENTO"
        case _             => "FUERA_DE_SERVICIO"
      }
      dimCsv.println(f"$id,Av. Principal ${rnd.nextInt(2000)}%d Lima,$lat%.6f,$lon%.6f,$cap,$modelo,$estado")
    }
    dimCsv.close()

    val factCsv = new PrintWriter(factDir.resolve("fact_transactions_20260101_000000.csv").toFile)
    factCsv.println("id_transaccion,id_atm,fecha,monto,tipo_movimiento,status_transaccion")
    val nowMs = clock.getTime
    val twoYearsMs = 730L * 24 * 3600 * 1000
    (1 to nTx).foreach { _ =>
      val txId = new UUID(rnd.nextLong(), rnd.nextLong()).toString
      val atm = if (rnd.nextDouble() < rates.nullFk) "" else atmIds(rnd.nextInt(nAtms))
      val fecha =
        if (rnd.nextDouble() < rates.futureDate)
          new Timestamp(Timestamp.from(Instant.parse("2030-01-01T00:00:00Z")).getTime
            + (rnd.nextDouble() * 5 * 365.25 * 24 * 3600 * 1000).toLong)
        else new Timestamp(nowMs - (rnd.nextDouble() * twoYearsMs).toLong)
      val cents = 1000 + rnd.nextInt(799001) // 10.00 .. 8000.00
      val signed = if (rnd.nextDouble() < rates.negativeAmount) -cents else cents
      val monto = BigDecimal(signed, 2)
      val tipo = if (rnd.nextDouble() < 0.80) "RETIRO" else "DEPOSITO"
      val status = rnd.nextDouble() match {
        case d if d < 1.0 - rates.failedStatus        => "EXITOSA"
        case d if d < 1.0 - rates.failedStatus / 2.0  => "FALLIDA"
        case _                                        => "REVERSADA"
      }
      factCsv.println(s"$txId,$atm,$fecha,$monto,$tipo,$status")
    }
    factCsv.close()

    // flag written LAST — consumers must never see a partial batch
    Files.write(Paths.get(root, "_READY"), Array.emptyByteArray)
    (nAtms, nTx)
  }
}
